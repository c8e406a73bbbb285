"""Pallas TPU kernel: one pyramid level of Lucas-Kanade for all features.

Behavioral spec: identical math to ``lk._track_level`` (the Bouguet LK
level used by ``Tracker::featureTracking``, reference
``tracker.cpp:623-690``); oracle-tested against it in
tests/test_pallas_vision.py.

Why a hand kernel: LK is gather-bound — each feature needs a contiguous
(w+1)^2 window of 4 images (prev, gradients; current re-read per
iteration). XLA lowers the vmapped dynamic-slice to gather HLOs through
HBM. Here the four (edge-padded) images live whole in VMEM for the
duration of the level (~5 MB at VGA, VMEM is ~16 MB), and each window is
read directly from the VMEM ref.

Mosaic constraints shaping the kernel (probed on v5e):
 - memref slices at *dynamic* offsets must be tile-aligned: sublane
   start multiple of 8, lane start multiple of 128. So each window read
   fetches an aligned (32, 256) superslab and brings the window to the
   corner with two dynamic ``pltpu.roll``s (dynamic rotates are legal).
 - SMEM refs allow scalar loads only; VMEM values cannot be read as
   scalars. The running flow ``nu`` therefore lives as (1,1) vector
   values (reduction outputs), staged into a VMEM scratch and mirrored
   to SMEM with a tiny DMA once per iteration so the next iteration's
   window bases can be computed as scalars.
 - 1-D vector values are rejected; every vector intermediate is >= 2-D
   ((1,1) scalars-as-vectors, (p,p) windows).

The iteration and feature loops are Python-unrolled (static n_iters,
``_FB`` features per grid step); windows are (w+1, w+1) = (22, 22) at
the default half_win=10, so per-feature math runs on 3x1 vregs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FB = 8  # features per grid step
_SH = 32  # superslab sublanes (window rows 24 + up to 8 alignment slack)
_SW = 256  # superslab lanes (window cols 22 + up to 234 alignment slack)


def _lk_kernel(
    pts_ref, guess_ref,  # SMEM (FB, 2) — scalar reads
    ip_ref, ic_ref, gx_ref, gy_ref,  # VMEM (HP, WP) whole padded images
    flow_ref, ok_ref,  # VMEM out (FB, 2), (FB, 1) int32
    nu_v, nu_s, nu_sem,  # VMEM (2*FB,2) + SMEM mirror + DMA sem
    *, half_win: int, n_iters: int, min_eig_thr: float, hp: int, wp: int,
    pad: int, eps: float,
):
    w = 2 * half_win + 1
    p = w + 1
    f32 = ip_ref.dtype

    def window(ref, px, py, dx, dy):
        """(p, p) window of `ref` based at floor((px,py)+(dx,dy)-half_win),
        in padded-image coords; px/py/dx/dy are scalars. Returns the
        window value and the bilinear fractions (scalars)."""
        sxf = px + dx - half_win
        syf = py + dy - half_win
        bxf = jnp.floor(sxf)
        byf = jnp.floor(syf)
        fx = sxf - bxf
        fy = syf - byf
        # clip to the data region (hp/wp include 8 rows / 128 cols of extra
        # slack so the aligned superslab below never runs off the buffer —
        # and Mosaic can prove (x//T)*T alignment without a clamp)
        bx = jnp.clip(bxf.astype(jnp.int32) + pad, 0, wp - 128 - p)
        by = jnp.clip(byf.astype(jnp.int32) + pad, 0, hp - 8 - p)
        by8 = (by // 8) * 8
        bx128 = (bx // 128) * 128
        slab = ref[pl.ds(by8, _SH), pl.ds(bx128, _SW)]
        slab = pltpu.roll(slab, -(by - by8), axis=0)
        slab = pltpu.roll(slab, -(bx - bx128), axis=1)
        return slab[:p, :p], fx, fy

    def interp(slab, fx, fy):
        """Constant-fraction bilinear: (p, p) slab -> (w, w) window.
        fx, fy are scalars (broadcast onto the vector)."""
        return (
            slab[0:w, 0:w] * ((1 - fx) * (1 - fy))
            + slab[0:w, 1 : w + 1] * (fx * (1 - fy))
            + slab[1 : w + 1, 0:w] * ((1 - fx) * fy)
            + slab[1 : w + 1, 1 : w + 1] * (fx * fy)
        )

    def s11(x):
        """(w, w) -> (1, 1) windowed sum."""
        return jnp.sum(x, axis=(0, 1), keepdims=True)

    # ---- per-feature time-invariant quantities
    feats = []
    for f in range(_FB):
        px = pts_ref[f, 0]
        py = pts_ref[f, 1]
        sp, fx0, fy0 = window(ip_ref, px, py, 0.0, 0.0)
        sx, _, _ = window(gx_ref, px, py, 0.0, 0.0)
        sy, _, _ = window(gy_ref, px, py, 0.0, 0.0)
        patch_prev = interp(sp, fx0, fy0)
        ix = interp(sx, fx0, fy0)
        iy = interp(sy, fx0, fy0)
        gxx = s11(ix * ix)
        gxy = s11(ix * iy)
        gyy = s11(iy * iy)
        det = gxx * gyy - gxy * gxy
        tr = gxx + gyy
        min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) * 0.5
        ok = min_eig / (w * w) > min_eig_thr
        det_safe = jnp.where(jnp.abs(det) > 1e-12, det, jnp.ones_like(det))
        feats.append((patch_prev, ix, iy, gxx, gxy, gyy, det_safe, ok))
        # init running flow from the guess (scalar splat -> (1, 2)); rows
        # FB..2FB-1 carry each feature's last |dnu|^2 for the convergence
        # early-exit (init large so the first iteration always runs)
        nu_v[pl.ds(f, 1), :] = jnp.concatenate(
            [jnp.full((1, 1), guess_ref[f, 0], f32),
             jnp.full((1, 1), guess_ref[f, 1], f32)], axis=1
        )
        nu_v[pl.ds(_FB + f, 1), :] = jnp.full((1, 2), 1e9, f32)

    mirror = pltpu.make_async_copy(nu_v, nu_s, nu_sem)
    mirror.start()
    mirror.wait()

    # ---- unrolled Bouguet iterations (per-feature convergence skip:
    # OpenCV termcrit semantics — apply dnu, stop once |dnu|^2 <= eps^2)
    eps2 = float(eps) * float(eps)
    for _ in range(n_iters):
        for f in range(_FB):
            @pl.when(nu_s[_FB + f, 0] > eps2)
            def _(f=f):
                patch_prev, ix, iy, gxx, gxy, gyy, det_safe, _ = feats[f]
                px = pts_ref[f, 0]
                py = pts_ref[f, 1]
                sc, fxc, fyc = window(ic_ref, px, py, nu_s[f, 0], nu_s[f, 1])
                patch_cur = interp(sc, fxc, fyc)
                di = patch_prev - patch_cur
                bx_ = s11(di * ix)
                by_ = s11(di * iy)
                dnu = jnp.concatenate(
                    [gyy * bx_ - gxy * by_, gxx * by_ - gxy * bx_], axis=1
                ) / det_safe
                nu_v[pl.ds(f, 1), :] = nu_v[pl.ds(f, 1), :] + dnu
                d2 = jnp.sum(dnu * dnu, axis=1, keepdims=True)
                nu_v[pl.ds(_FB + f, 1), :] = jnp.concatenate([d2, d2], axis=1)
        mirror = pltpu.make_async_copy(nu_v, nu_s, nu_sem)
        mirror.start()
        mirror.wait()

    flow_ref[:] = nu_v[:_FB]
    for f in range(_FB):
        ok_ref[pl.ds(f, 1), :] = feats[f][7].astype(jnp.int32)


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
    """One LK level for all K features (drop-in for ``lk._track_level``)."""
    k = pts_prev.shape[0]
    dtype = img_prev.dtype
    pad = half_win + 1

    # edge pad (clamped sampling), then round up to tile multiples plus one
    # extra tile of slack so aligned superslab reads stay in bounds
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
        _lk_kernel, half_win=half_win, n_iters=n_iters,
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
            pltpu.VMEM((2 * _FB, 2), dtype),
            pltpu.SMEM((2 * _FB, 2), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(pts_p, guess_p, ip, ic, gx, gy)
    return flow[:k], ok[:k, 0].astype(bool)
