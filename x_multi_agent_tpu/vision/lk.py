"""Pyramidal Lucas-Kanade optical flow (Bouguet).

Behavioral spec: reference ``Tracker::featureTracking`` using
``cv::calcOpticalFlowPyrLK`` (``tracker.cpp:623-690``): window win_size,
pyramid max_level, iterative refinement, minimum-eigenvalue quality gate
(min_eig_thr) and border rejection.

TPU design: all features solved simultaneously — patch gathers are batched
bilinear samples; the 2x2 normal equations solve is closed-form; the
per-level iteration is a lax.fori_loop. vmap over features, everything
fixed shape.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .image import bilinear_sample, scharr_gradients


def _track_level(
    img_prev: jnp.ndarray,
    img_cur: jnp.ndarray,
    dx_prev: jnp.ndarray,
    dy_prev: jnp.ndarray,
    pts_prev: jnp.ndarray,  # (K, 2) at this level's scale
    guess: jnp.ndarray,  # (K, 2) current flow guess at this level
    half_win: int,
    n_iters: int,
    min_eig_thr: float,
):
    """One pyramid level of LK for all features. Returns (flow, ok)."""
    k = pts_prev.shape[0]
    w = 2 * half_win + 1
    off = jnp.arange(-half_win, half_win + 1, dtype=img_prev.dtype)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")
    offsets = jnp.stack([ox, oy], axis=-1).reshape(-1, 2)  # (w*w, 2)

    def one(pt, g):
        grid_prev = pt[None, :] + offsets  # (w2, 2)
        patch_prev = bilinear_sample(img_prev, grid_prev)
        ix = bilinear_sample(dx_prev, grid_prev)
        iy = bilinear_sample(dy_prev, grid_prev)
        gxx = jnp.sum(ix * ix)
        gxy = jnp.sum(ix * iy)
        gyy = jnp.sum(iy * iy)
        det = gxx * gyy - gxy * gxy
        # minimum eigenvalue of G / window area (OpenCV convention)
        tr = gxx + gyy
        min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) * 0.5
        ok = min_eig / (w * w) > min_eig_thr
        det_safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)

        def body(_, nu):
            grid_cur = pt[None, :] + nu[None, :] + offsets
            patch_cur = bilinear_sample(img_cur, grid_cur)
            di = patch_prev - patch_cur
            bx = jnp.sum(di * ix)
            by = jnp.sum(di * iy)
            dnu = jnp.stack([gyy * bx - gxy * by, gxx * by - gxy * bx]) / det_safe
            return nu + dnu

        nu = jax.lax.fori_loop(0, n_iters, body, g)
        return nu, ok

    return jax.vmap(one)(pts_prev, guess)


def track(
    pyr_prev: Sequence[jnp.ndarray],
    pyr_cur: Sequence[jnp.ndarray],
    pts_prev: jnp.ndarray,  # (K, 2) pixel coords at level 0
    valid: jnp.ndarray,  # (K,)
    half_win: int = 10,
    n_iters: int = 10,
    min_eig_thr: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Track points from the previous to the current pyramid.

    Returns (pts_cur (K,2), ok (K,)). Points out of bounds or failing the
    min-eigenvalue gate are flagged.
    """
    n_levels = len(pyr_prev)
    k = pts_prev.shape[0]
    flow = jnp.zeros_like(pts_prev)
    ok = valid

    grads = [scharr_gradients(lvl) for lvl in pyr_prev]

    for lvl in range(n_levels - 1, -1, -1):
        scale = 2.0**lvl
        pts_l = pts_prev / scale
        flow = flow * 2.0 if lvl < n_levels - 1 else flow / scale
        dx, dy = grads[lvl]
        flow, lvl_ok = _track_level(
            pyr_prev[lvl], pyr_cur[lvl], dx, dy, pts_l, flow,
            half_win, n_iters, min_eig_thr,
        )
        ok = ok & lvl_ok

    pts_cur = pts_prev + flow * 1.0  # flow is at level-0 scale after loop
    h, w = pyr_prev[0].shape
    margin = half_win
    inb = (
        (pts_cur[:, 0] >= margin)
        & (pts_cur[:, 0] < w - margin)
        & (pts_cur[:, 1] >= margin)
        & (pts_cur[:, 1] < h - margin)
    )
    return pts_cur, ok & inb & valid
