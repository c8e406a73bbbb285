"""Pallas TPU kernel: lane-packed Lucas-Kanade level (v2 of pallas_lk).

Same math as ``pallas_lk.track_level`` / ``lk._track_level`` (oracle-
tested), restructured for vector-lane utilization: the original kernel
does all window arithmetic on per-feature (22, 22) tiles — 22 of 128
lanes and 22 of 24 sublanes busy, ~13% of the VPU. Here each grid step
packs ``_FB`` = 8 features side by side in the lane dimension: every
feature owns a 32-lane segment of (24, 256) working rows, so the
per-iteration interpolation / difference / product math runs once for
all 8 features at ~66% lane utilization.

Layout invariants per 32-lane segment (feature f at lanes 32f..32f+31):
  * window slab columns 0..21 hold image columns base..base+21 (plus
    22..31 real neighbor columns, used by the +1-lane bilinear shift);
  * static intra-segment shifts never cross segment boundaries for the
    lanes that are consumed (window outputs use lanes 0..20);
  * per-feature scalars (fractions, Gram entries, flow) live as packed
    (1, 256) rows whose value is only meaningful at segment-start lanes;
    the 32-lane segment sums come from a roll-add chain whose result is
    exact at lanes 32f.

The running flow and per-feature convergence state are mirrored to SMEM
once per iteration (one small DMA), as in pallas_lk.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FB = 8  # features per grid step (8 x 32 lanes = 256)
_SEG = 32  # lanes per feature segment
_SH = 32  # superslab sublanes for the aligned gather
_SW = 256  # superslab lanes


def _lk2_kernel(
    pts_ref, guess_ref,  # SMEM (FB, 2)
    ip_ref, ic_ref, gx_ref, gy_ref,  # VMEM (HP, WP) padded images
    flow_ref, ok_ref,  # out (FB, 2), (FB, 1) int32
    st_v, st_s, sem,  # VMEM (8, 256) packed state + SMEM mirror + DMA sem
    *, half_win: int, n_iters: int, min_eig_thr: float, hp: int, wp: int,
    pad: int, eps: float,
):
    w = 2 * half_win + 1  # 21
    p = w + 1  # 22
    f32 = ip_ref.dtype
    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _FB * _SEG), 1) // _SEG
    masks = [(seg_iota == f).astype(f32) for f in range(_FB)]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (p + 2, _FB * _SEG), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (p + 2, _FB * _SEG), 1)
    win_mask = ((rows_iota < w) & (lane_iota % _SEG < w)).astype(f32)

    def gather32(ref, px, py, dx, dy):
        """(24, 32) window slab based at floor((px,py)+(dx,dy)-half_win)
        plus the bilinear fractions (scalars)."""
        sxf = px + dx - half_win
        syf = py + dy - half_win
        bxf = jnp.floor(sxf)
        byf = jnp.floor(syf)
        fx = sxf - bxf
        fy = syf - byf
        bx = jnp.clip(bxf.astype(jnp.int32) + pad, 0, wp - 128 - p)
        by = jnp.clip(byf.astype(jnp.int32) + pad, 0, hp - 8 - p)
        by8 = (by // 8) * 8
        bx128 = (bx // 128) * 128
        slab = ref[pl.ds(by8, _SH), pl.ds(bx128, _SW)]
        slab = pltpu.roll(slab, -(by - by8), axis=0)
        slab = pltpu.roll(slab, -(bx - bx128), axis=1)
        return slab[: p + 2, :_SEG], fx, fy

    def pack(values):
        """[(24, 32)] x FB -> (24, 256): place each feature's slab in its
        lane segment (disjoint adds after static rolls)."""
        acc = None
        for f, v in enumerate(values):
            vp = jnp.pad(v, ((0, 0), (0, (_FB - 1) * _SEG)))
            vp = pltpu.roll(vp, f * _SEG, axis=1) if f else vp
            acc = vp if acc is None else acc + vp
        return acc

    def pack_scalar_row(scalars):
        """[(scalar)] x FB -> (1, 256) row with scalar f broadcast over
        segment f."""
        acc = None
        for f, v in enumerate(scalars):
            term = masks[f] * v
            acc = term if acc is None else acc + term
        return acc

    def shift_l(x, k):
        """lane shift: out[l] = x[l + k] (k static, within-segment use;
        pltpu.roll wants non-negative amounts -> rotate by size - k)."""
        return pltpu.roll(x, _FB * _SEG - k, axis=1)

    def interp(s, fx_row, fy_row):
        """packed bilinear: (24, 256) slab rows -> (24, 256) windows."""
        s10 = shift_l(s, 1)
        s01 = pltpu.roll(s, s.shape[0] - 1, axis=0)
        s11 = shift_l(s01, 1)
        return (
            s * ((1 - fx_row) * (1 - fy_row))
            + s10 * (fx_row * (1 - fy_row))
            + s01 * ((1 - fx_row) * fy_row)
            + s11 * (fx_row * fy_row)
        )

    def seg_sum(x):
        """(24, 256) masked window values -> (1, 256) row whose value at
        lane 32f is the segment sum (garbage elsewhere)."""
        r = jnp.sum(x, axis=0, keepdims=True)
        for k in (1, 2, 4, 8, 16):
            r = r + shift_l(r, k)
        return r

    # ---- phase A: prev-frame windows, packed --------------------------
    slabs_p, slabs_x, slabs_y = [], [], []
    fx0s, fy0s = [], []
    for f in range(_FB):
        px = pts_ref[f, 0]
        py = pts_ref[f, 1]
        sp, fx0, fy0 = gather32(ip_ref, px, py, 0.0, 0.0)
        sx, _, _ = gather32(gx_ref, px, py, 0.0, 0.0)
        sy, _, _ = gather32(gy_ref, px, py, 0.0, 0.0)
        slabs_p.append(sp)
        slabs_x.append(sx)
        slabs_y.append(sy)
        fx0s.append(fx0)
        fy0s.append(fy0)
    fx_row = pack_scalar_row(fx0s)
    fy_row = pack_scalar_row(fy0s)
    prev_pk = interp(pack(slabs_p), fx_row, fy_row) * win_mask
    ix_pk = interp(pack(slabs_x), fx_row, fy_row) * win_mask
    iy_pk = interp(pack(slabs_y), fx_row, fy_row) * win_mask

    gxx = seg_sum(ix_pk * ix_pk)
    gxy = seg_sum(ix_pk * iy_pk)
    gyy = seg_sum(iy_pk * iy_pk)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) * 0.5
    ok_row = (min_eig / (w * w) > min_eig_thr).astype(jnp.int32)
    det_safe = jnp.where(jnp.abs(det) > 1e-12, det, jnp.ones_like(det))

    # ---- packed running state: rows 0..1 = nu_x, nu_y ; row 2 = |dnu|^2
    # (meaningful at segment-start lanes); mirrored to SMEM per iteration
    nu_x = pack_scalar_row([guess_ref[f, 0] for f in range(_FB)])
    nu_y = pack_scalar_row([guess_ref[f, 1] for f in range(_FB)])
    d2 = jnp.full((1, _FB * _SEG), 1e9, f32)

    def mirror(nu_x, nu_y, d2):
        st_v[0:1, :] = nu_x
        st_v[1:2, :] = nu_y
        st_v[2:3, :] = d2
        cp = pltpu.make_async_copy(st_v, st_s, sem)
        cp.start()
        cp.wait()

    mirror(nu_x, nu_y, d2)

    eps2 = float(eps) * float(eps)
    for _ in range(n_iters):
        # gather current-frame slabs at nu (scalars from the SMEM mirror);
        # skip converged features' gathers
        slabs_c = []
        fxcs, fycs = [], []
        for f in range(_FB):
            px = pts_ref[f, 0]
            py = pts_ref[f, 1]
            sc, fxc, fyc = gather32(
                ic_ref, px, py, st_s[0, f * _SEG], st_s[1, f * _SEG]
            )
            slabs_c.append(sc)
            fxcs.append(fxc)
            fycs.append(fyc)
        fxc_row = pack_scalar_row(fxcs)
        fyc_row = pack_scalar_row(fycs)
        cur_pk = interp(pack(slabs_c), fxc_row, fyc_row)
        di = prev_pk - cur_pk * win_mask
        bx_ = seg_sum(di * ix_pk)
        by_ = seg_sum(di * iy_pk)
        dnu_x = (gyy * bx_ - gxy * by_) / det_safe
        dnu_y = (gxx * by_ - gxy * bx_) / det_safe
        active = (d2 > eps2).astype(f32)
        dnu_x = dnu_x * active
        dnu_y = dnu_y * active
        nu_x = nu_x + dnu_x
        nu_y = nu_y + dnu_y
        d2 = jnp.where(
            d2 > eps2, dnu_x * dnu_x + dnu_y * dnu_y, d2
        )
        mirror(nu_x, nu_y, d2)

    for f in range(_FB):
        flow_ref[pl.ds(f, 1), 0:1] = jnp.full((1, 1), st_s[0, f * _SEG], f32)
        flow_ref[pl.ds(f, 1), 1:2] = jnp.full((1, 1), st_s[1, f * _SEG], f32)
        ok_ref[pl.ds(f, 1), :] = ok_row[0:1, f * _SEG : f * _SEG + 1]


@functools.partial(
    jax.jit,
    static_argnames=("half_win", "n_iters", "min_eig_thr", "eps", "interpret"),
)
def track_level(
    img_prev: jnp.ndarray,
    img_cur: jnp.ndarray,
    dx_prev: jnp.ndarray,
    dy_prev: jnp.ndarray,
    pts_prev: jnp.ndarray,  # (K, 2)
    guess: jnp.ndarray,  # (K, 2)
    half_win: int = 10,
    n_iters: int = 10,
    min_eig_thr: float = 1e-4,
    eps: float = 0.01,
    interpret: bool = False,
):
    """Lane-packed drop-in for ``pallas_lk.track_level`` (half_win <= 14)."""
    assert 2 * half_win + 2 + 2 <= _SEG, "window must fit a 32-lane segment"
    k = pts_prev.shape[0]
    dtype = img_prev.dtype
    pad = half_win + 1

    h0, w0 = img_prev.shape
    hp = max(-(-(h0 + 2 * pad) // 8) * 8, _SH) + 8
    wp = max(-(-(w0 + 2 * pad) // 128) * 128, _SW) + 128
    pads = ((pad, hp - h0 - 2 * pad + pad), (pad, wp - w0 - 2 * pad + pad))
    ip = jnp.pad(img_prev, pads, mode="edge")
    ic = jnp.pad(img_cur, pads, mode="edge")
    gx = jnp.pad(dx_prev, pads, mode="edge")
    gy = jnp.pad(dy_prev, pads, mode="edge")

    kb = -(-k // _FB) * _FB
    pts_p = jnp.zeros((kb, 2), dtype).at[:k].set(pts_prev.astype(dtype))
    guess_p = jnp.zeros((kb, 2), dtype).at[:k].set(guess.astype(dtype))

    kernel = functools.partial(
        _lk2_kernel, half_win=half_win, n_iters=n_iters,
        min_eig_thr=float(min_eig_thr), hp=hp, wp=wp, pad=pad,
        eps=float(eps),
    )
    img_spec = pl.BlockSpec((hp, wp), lambda j: (0, 0), memory_space=pltpu.VMEM)
    flow, ok = pl.pallas_call(
        kernel,
        grid=(kb // _FB,),
        in_specs=[
            pl.BlockSpec((_FB, 2), lambda j: (j, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_FB, 2), lambda j: (j, 0), memory_space=pltpu.SMEM),
            img_spec, img_spec, img_spec, img_spec,
        ],
        out_specs=(
            pl.BlockSpec((_FB, 2), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_FB, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((kb, 2), dtype),
            jax.ShapeDtypeStruct((kb, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, _FB * _SEG), dtype),
            pltpu.SMEM((8, _FB * _SEG), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(pts_p, guess_p, ip, ic, gx, gy)
    return flow[:k], ok[:k, 0].astype(bool)
