"""Image pyramid + interpolation primitives.

Behavioral spec: reference ``Tracker::getImagePyramid`` (cv::pyrDown,
``tracker.cpp:400-418``). pyrDown = 5-tap Gaussian [1 4 6 4 1]/16 separable
blur + 2x decimation; implemented as XLA convolutions (MXU/VPU-friendly,
fused by the compiler — no hand kernel needed at these sizes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_K5 = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _sep_blur5(img: jnp.ndarray) -> jnp.ndarray:
    """Separable 5-tap Gaussian blur with edge replication (cv::pyrDown's
    BORDER_REFLECT_101 is approximated by edge replication)."""
    k = _K5.astype(img.dtype)
    x = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, :, None], (1, 1), "VALID"
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (2, 2)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, None, :], (1, 1), "VALID"
    )[0, 0]
    return x


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """One pyramid level: blur then take every other pixel."""
    return _sep_blur5(img)[::2, ::2]


def build_pyramid(img: jnp.ndarray, depth: int):
    """List of `depth + 1` levels (level 0 = input), reference
    ``pyramid_depth_`` semantics (tracker.h:272)."""
    levels = [img]
    for _ in range(depth):
        levels.append(pyr_down(levels[-1]))
    return levels


def bilinear_sample(img: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation at float (x, y) positions.

    pts: (..., 2) in (x, y) pixel coords. Out-of-bounds clamps to the edge.
    """
    h, w = img.shape
    x = jnp.clip(pts[..., 0], 0.0, w - 1.001)
    y = jnp.clip(pts[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def scharr_gradients(img: jnp.ndarray):
    """(dx, dy) image gradients with the 3x3 Scharr operator (what
    cv::calcOpticalFlowPyrLK uses internally)."""
    gk = jnp.asarray([3.0, 10.0, 3.0], img.dtype) / 32.0
    dk = jnp.asarray([-1.0, 0.0, 1.0], img.dtype)

    def sep(img, kr, kc):
        x = jnp.pad(img, ((1, 1), (0, 0)), mode="edge")
        x = jax.lax.conv_general_dilated(
            x[None, None], kr[None, None, :, None], (1, 1), "VALID"
        )[0, 0]
        x = jnp.pad(x, ((0, 0), (1, 1)), mode="edge")
        x = jax.lax.conv_general_dilated(
            x[None, None], kc[None, None, None, :], (1, 1), "VALID"
        )[0, 0]
        return x

    dx = sep(img, gk, dk)
    dy = sep(img, dk, gk)
    return dx, dy
