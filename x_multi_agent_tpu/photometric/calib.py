"""Online thermal photometric calibration (Das et al.).

Behavioral spec: reference ``src/x/photometric_calibration/irPhotoCalib.cpp``:
  * per frame-pair affine gains (a, b) fitted to tracked-feature intensity
    pairs with the residual  o - (o' (a-b) + b)  and regularizers
    0.1*(a-1), 0.1*b (``photoetricOptimization.h``) — the model is LINEAR
    in (a, b), so the reference's Ceres solves collapse to closed-form
    2x2 normal equations
  * RANSAC over 4-point solves, vote threshold 8e-3, refit on the best
    inlier set (``EstimateGainsRansac``) -> here a fixed vmapped
    hypothesis batch + masked refit
  * gain chaining / relative-gain algebra and epsilon_gap / epsilon_base
    drift anchoring (``irPhotoCalib.cpp:68-82,148-156``)
  * multi-history-frame aggregation weighted by inlier support
    (``ProcessCurrentFrame``; the reference's OpenMP parallel-for becomes
    vmap)
  * spatial per-cell offsets from a +1/-1 difference system
    (``EstimateSpatialParameters``; Eigen LSCG -> dense normal equations
    with Tikhonov) smoothed by SE-kernel Gaussian-process regression
  * image correction with the cyclic fold + triangular LUT
    (``getCorrectedImage``, ``irPhotoCalib.cpp:24-51,422-472``)
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

REG_W = 0.1
RANSAC_THR = 8.0e-3


# ---------------------------------------------------------------------------
# gain algebra (irPhotoCalib.cpp:68-82)
# ---------------------------------------------------------------------------


def relative_gains(a1, b1, a2, b2):
    e12 = (a2 - b2) / (a1 - b1)
    b12 = (b2 - b1) / (a1 - b1)
    return e12 + b12, b12


def chain_gains(a01, b01, a12, b12):
    e02 = (a01 - b01) * (a12 - b12)
    b02 = b01 + (a01 - b01) * b12
    return e02 + b02, b02


# ---------------------------------------------------------------------------
# pairwise gain estimation
# ---------------------------------------------------------------------------


def _solve_gain_ls(o, op, w_rows):
    """Regularized LS for (a, b): rows o_i = op_i * a + (1 - op_i) * b,
    plus REG_W*(a-1)=0 and REG_W*b=0; w_rows masks data rows."""
    dtype = o.dtype
    a_col = op * w_rows
    b_col = (1.0 - op) * w_rows
    ata = jnp.array(
        [
            [jnp.sum(a_col * a_col) + REG_W**2, jnp.sum(a_col * b_col)],
            [jnp.sum(a_col * b_col), jnp.sum(b_col * b_col) + REG_W**2],
        ]
    )
    atb = jnp.array(
        [jnp.sum(a_col * o * w_rows) + REG_W**2 * 1.0, jnp.sum(b_col * o * w_rows)]
    )
    sol = jnp.linalg.solve(ata, atb)
    return sol[0], sol[1]


def estimate_gains_ransac(
    o: jnp.ndarray,  # (J,) intensities in the history frame
    op: jnp.ndarray,  # (J,) intensities in the current frame
    valid: jnp.ndarray,  # (J,)
    key: jnp.ndarray,
    n_hypotheses: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (a, b, n_inliers). Fewer than 4 valid points -> (1, 0, 0)."""
    j = o.shape[0]
    probs = valid.astype(o.dtype)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.random.categorical(
        key, jnp.log(jnp.maximum(probs, 1e-30)), shape=(n_hypotheses, 4)
    )

    def one(sample):
        a, b = _solve_gain_ls(o[sample], op[sample], jnp.ones(4, o.dtype))
        resid = jnp.abs(o - (op * (a - b) + b))
        inl = (resid < RANSAC_THR) & valid
        return a, b, jnp.sum(inl), inl

    a_h, b_h, votes, inl_h = jax.vmap(one)(idx)
    best = jnp.argmax(votes)
    inliers = inl_h[best]
    # final refit on the best inlier set
    a, b = _solve_gain_ls(o, op, inliers.astype(o.dtype))
    enough = jnp.sum(valid) >= 4
    a = jnp.where(enough, a, 1.0)
    b = jnp.where(enough, b, 0.0)
    n_inl = jnp.where(enough, votes[best], 0)
    return a, b, n_inl


# ---------------------------------------------------------------------------
# temporal state + per-frame processing
# ---------------------------------------------------------------------------


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


class PhotoDims(NamedTuple):
    n_history: int = 4  # history frames matched per call
    n_obs: int = 100  # intensity pairs per history frame (budget)
    window: int = 15  # params_PT ring length (irPhotoCalib.cpp:213-216)


@_pytree_dataclass
class PhotoState:
    params_pt: jnp.ndarray  # (window, 2) origin-referenced (a, b) per frame
    frame_ptr: jnp.ndarray  # int32: index of the newest frame in the ring
    n_frames: jnp.ndarray  # int32

    @staticmethod
    def zero(dims: PhotoDims, dtype=jnp.float32) -> "PhotoState":
        pt = jnp.zeros((dims.window, 2), dtype).at[:, 0].set(1.0)
        return PhotoState(
            params_pt=pt,
            frame_ptr=jnp.asarray(0, jnp.int32),
            n_frames=jnp.asarray(1, jnp.int32),
        )


def process_frame(
    dims: PhotoDims,
    state: PhotoState,
    intensity_history: jnp.ndarray,  # (Fh, J) intensities in history frames
    intensity_current: jnp.ndarray,  # (Fh, J) same features in current frame
    pair_valid: jnp.ndarray,  # (Fh, J)
    frame_offsets: jnp.ndarray,  # (Fh,) int32: how many frames back (>=1)
    key: jnp.ndarray,
    epsilon_gap: float = 0.02,
    epsilon_base: float = 0.005,
) -> Tuple[PhotoState, jnp.ndarray, jnp.ndarray]:
    """One ``ProcessCurrentFrame``: estimate this frame's origin-referenced
    gains. Returns (state, a, b) for the current frame."""
    fh = intensity_history.shape[0]
    dtype = intensity_history.dtype
    w = dims.window

    prev = state.params_pt[state.frame_ptr]
    a_prev, b_prev = prev[0], prev[1]

    keys = jax.random.split(key, fh)

    def per_history(ih, ic, pv, off, k):
        a_hc, b_hc, support = estimate_gains_ransac(ih, ic, pv, k)
        hist_idx = (state.frame_ptr - (off - 1)) % w
        ph = state.params_pt[hist_idx]
        a_oc, b_oc = chain_gains(ph[0], ph[1], a_hc, b_hc)
        a_pc, b_pc = relative_gains(a_prev, b_prev, a_oc, b_oc)
        ok = (jnp.sum(pv) > 4) & (off <= state.n_frames)
        support = jnp.where(ok, support, 0)
        return a_pc * support, b_pc * support, support

    wa, wb, cnt = jax.vmap(per_history)(
        intensity_history, intensity_current, pair_valid, frame_offsets, keys
    )
    w_count = jnp.sum(cnt)
    a_pc = jnp.where(w_count >= 5, jnp.sum(wa) / jnp.maximum(w_count, 1), 1.0)
    b_pc = jnp.where(w_count >= 5, jnp.sum(wb) / jnp.maximum(w_count, 1), 0.0)

    # drift anchoring (irPhotoCalib.cpp:148-156)
    delta = (1.0 - (a_pc - b_pc)) * epsilon_gap
    a_pc = a_pc + delta
    b_pc = b_pc - delta
    a_pc = a_pc - (a_pc - 1.0) * epsilon_base
    b_pc = b_pc - b_pc * epsilon_base

    a_oc, b_oc = chain_gains(a_prev, b_prev, a_pc, b_pc)
    ptr = (state.frame_ptr + 1) % w
    params_pt = state.params_pt.at[ptr].set(jnp.stack([a_oc, b_oc]))
    state = PhotoState(
        params_pt=params_pt,
        frame_ptr=ptr,
        n_frames=jnp.minimum(state.n_frames + 1, w),
    )
    return state, a_oc, b_oc


# ---------------------------------------------------------------------------
# spatial calibration
# ---------------------------------------------------------------------------


def estimate_spatial_parameters(
    n_cells_x: int,
    n_cells_y: int,
    sid_hist: jnp.ndarray,  # (S,) int32 cell ids
    sid_cur: jnp.ndarray,  # (S,)
    vec_b: jnp.ndarray,  # (S,) rhs
    valid: jnp.ndarray,  # (S,)
    gp_length_scale: float = 1.5,
    gp_sigma_f: float = 0.1,
    gp_sigma_n: float = 0.01,
) -> jnp.ndarray:
    """Per-cell offsets: solve the +1/-1 difference system (rows
    x[sid_cur] - x[sid_hist] = b) by dense Tikhonov-regularized normal
    equations, then smooth over the cell grid with SE-kernel GPR.
    Returns (n_cells_y, n_cells_x) float offsets."""
    n = n_cells_x * n_cells_y
    dtype = vec_b.dtype
    wrow = valid.astype(dtype)
    onehot_p = (sid_cur[:, None] == jnp.arange(n)[None, :]).astype(dtype)
    onehot_m = (sid_hist[:, None] == jnp.arange(n)[None, :]).astype(dtype)
    a_mat = (onehot_p - onehot_m) * wrow[:, None]  # (S, n)
    ata = a_mat.T @ a_mat + 1e-6 * jnp.eye(n, dtype=dtype)
    atb = a_mat.T @ (vec_b * wrow)
    x = jnp.linalg.solve(ata, atb)  # (n,)

    # which cells were observed (trainable points)
    seen = (onehot_p.sum(0) + onehot_m.sum(0)) > 0

    # SE-kernel GPR over cell coordinates
    cx = jnp.arange(n) % n_cells_x
    cy = jnp.arange(n) // n_cells_x
    pts = jnp.stack([cx, cy], axis=1).astype(dtype)  # (n, 2)
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    k_full = gp_sigma_f**2 * jnp.exp(-0.5 * d2 / gp_length_scale**2)
    # mask unseen training points by inflating their noise
    noise = jnp.where(seen, gp_sigma_n**2, 1e6)
    k_train = k_full + jnp.diag(noise)
    alpha = jnp.linalg.solve(k_train, jnp.where(seen, x, 0.0))
    smooth = k_full @ alpha  # predict at all cells
    return smooth.reshape(n_cells_y, n_cells_x)


def expand_spatial(params_cells: jnp.ndarray, h: int, w: int, div: int):
    """(cells_y, cells_x) -> per-pixel map by nearest-cell replication."""
    return jnp.repeat(jnp.repeat(params_cells, div, axis=0), div, axis=1)[:h, :w]


# ---------------------------------------------------------------------------
# image correction (irPhotoCalib.cpp:24-51, 422-472)
# ---------------------------------------------------------------------------


def _fold_lut(v: jnp.ndarray) -> jnp.ndarray:
    """Triangular LUT: i<128 -> 2i ; i==128 -> 255 ; i>128 -> 512-2i."""
    return jnp.where(v < 128, 2 * v, jnp.where(v == 128, 255, 512 - 2 * v))


def correct_image(
    img: jnp.ndarray,  # (H, W) uint8 or [0,255] float
    a,
    b,
    params_ps: jnp.ndarray = None,  # (H, W) spatial offsets or None
    cyclic_lut: bool = False,
) -> jnp.ndarray:
    """Gain-corrected image, reference ``getCorrectedImage``
    (irPhotoCalib.cpp:442-472).

    ``cyclic_lut=True`` reproduces the reference exactly: the corrected
    intensity is wrapped modulo 256 and remapped through the triangular
    fold LUT (irPhotoCalib.cpp:42-51) — appropriate for AGC'd thermal
    sources whose radiometry genuinely wraps. For ordinary 8-bit imagery
    the fold is NON-MONOTONIC (it doubles values below 128 and mirrors
    those above), so two distinct radiances map to one output and image
    gradients reverse around mid-gray; applied online it progressively
    destroyed LK tracking as the estimated gain drifted (round-4 replay:
    near-total match loss windows at ~8-10 s, 3x wall cost downstream).
    Default: plain clipping, float output (deliberate deviation, gated by
    flag for reference parity)."""
    x = img.astype(jnp.float32) / 255.0
    corr = x * (a - b) + b
    if params_ps is not None:
        corr = corr - params_ps
    if cyclic_lut:
        v = (corr * 255.0).astype(jnp.int32) % 256
        return _fold_lut(v).astype(jnp.uint8)
    return jnp.clip(corr, 0.0, 1.0) * 255.0
