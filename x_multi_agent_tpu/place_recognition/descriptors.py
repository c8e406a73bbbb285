"""Binary feature descriptors (steered BRIEF / ORB-like).

Behavioral spec: reference descriptors are cv::ORB computed during
detection (``place_recognition.cpp:58-94``). Re-design: a steered-BRIEF
kernel — orientation from the intensity centroid of a radius-15 patch
(Rosin moments, like ORB), then 256 smoothed-pixel pair comparisons with
the sampling pattern rotated by the orientation. The test-pair pattern is
generated once from a fixed seed (descriptors must be consistent across
agents of THIS framework, not bit-compatible with OpenCV).

All gathers are batched bilinear samples -> vmap over keypoints.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..vision.image import bilinear_sample, _sep_blur5

N_BITS = 256
PATCH_R = 15


def _pattern() -> np.ndarray:
    """(256, 2, 2) test-pair coordinates, Gaussian like the BRIEF paper."""
    rng = np.random.default_rng(1234)
    pts = rng.normal(0.0, PATCH_R / 2.5, size=(N_BITS, 2, 2))
    return np.clip(pts, -PATCH_R + 1, PATCH_R - 1)


_PATTERN = _pattern()

# intensity-centroid sampling disc
_disc = [
    (dy, dx)
    for dy in range(-PATCH_R, PATCH_R + 1)
    for dx in range(-PATCH_R, PATCH_R + 1)
    if dx * dx + dy * dy <= PATCH_R * PATCH_R
]
_DISC = np.asarray(_disc, np.float32)  # (P, 2) as (dy, dx)


def compute(img: jnp.ndarray, pts: jnp.ndarray, valid: jnp.ndarray):
    """Descriptors for keypoints.

    img: (H, W) float; pts: (K, 2) pixel coords; valid: (K,).
    Returns (desc (K, 32) uint8, ok (K,)) — ok requires the whole patch in
    bounds.
    """
    dtype = img.dtype
    smooth = _sep_blur5(img)
    disc = jnp.asarray(_DISC, dtype)
    pattern = jnp.asarray(_PATTERN, dtype)
    h, w = img.shape

    def one(pt):
        # orientation from intensity centroid (ORB)
        grid = pt[None, :] + disc[:, ::-1]  # (P, 2) in (x, y)
        vals = bilinear_sample(smooth, grid)
        m10 = jnp.sum(vals * disc[:, 1])
        m01 = jnp.sum(vals * disc[:, 0])
        theta = jnp.arctan2(m01, m10)
        c, s = jnp.cos(theta), jnp.sin(theta)
        rot = jnp.array([[c, -s], [s, c]], dtype)

        pa = pt[None, :] + pattern[:, 0] @ rot.T  # (256, 2)
        pb = pt[None, :] + pattern[:, 1] @ rot.T
        va = bilinear_sample(smooth, pa)
        vb = bilinear_sample(smooth, pb)
        bits = (va < vb).astype(jnp.uint8)  # (256,)
        # pack LSB-first into 32 bytes
        bytes_ = bits.reshape(32, 8) @ (2 ** jnp.arange(8, dtype=jnp.uint8))
        inb = (
            (pt[0] >= PATCH_R + 2) & (pt[0] < w - PATCH_R - 2)
            & (pt[1] >= PATCH_R + 2) & (pt[1] < h - PATCH_R - 2)
        )
        return bytes_.astype(jnp.uint8), inb

    desc, inb = jax.vmap(one)(pts)
    return desc, inb & valid


def hamming_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(Na, 32) x (Nb, 32) uint8 -> (Na, Nb) int32 Hamming distances
    (XOR + popcount reduction; the reference's BF-Hamming matcher)."""
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jax.lax.population_count(x).astype(jnp.int32).sum(-1)


def knn2_match(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    ratio_thr: float,
    abs_thr: float,
):
    """kNN(k=2) + Lowe ratio + absolute-distance gates (reference
    ``place_recognition.cpp:248-263``).

    Returns (idx_b (Na,), ok (Na,)).
    """
    d = hamming_matrix(desc_a, desc_b)
    big = jnp.iinfo(jnp.int32).max
    d = jnp.where(valid_b[None, :], d, big)
    best = jnp.argmin(d, axis=1)
    d1 = jnp.min(d, axis=1)
    d_wo = d.at[jnp.arange(d.shape[0]), best].set(big)
    d2 = jnp.min(d_wo, axis=1)
    ok = (
        valid_a
        & (d1 < abs_thr)
        & (d1.astype(jnp.float32) < ratio_thr * d2.astype(jnp.float32))
    )
    return best.astype(jnp.int32), ok
