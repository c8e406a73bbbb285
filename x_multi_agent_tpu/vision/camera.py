"""FOV-model camera (behavioral spec: reference ``src/x/vision/camera.cpp``).

Intrinsics are fractional (fx is a fraction of image width etc.,
``camera.cpp:27-48``). Distortion is the FOV model (Devernay & Faugeras):
undistortion of a radial distance r is tan(r * s) / (2 tan(s/2))
(``camera.cpp:163-169``), applied only for r > 0.01 like the reference.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    fx: float  # pixels
    fy: float
    cx: float
    cy: float
    s: float  # FOV parameter; 0 = no distortion
    width: int
    height: int

    @staticmethod
    def from_fractional(fx, fy, cx, cy, s, width, height) -> "Camera":
        return Camera(fx * width, fy * height, cx * width, cy * height, s, width, height)

    @property
    def inv_fx(self):
        return 1.0 / self.fx

    @property
    def inv_fy(self):
        return 1.0 / self.fy


def undistort(cam: Camera, pts_dist: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixel coords (..., 2) -> undistorted pixel coords.

    Mirrors ``Camera::undistort`` (``camera.cpp:69-87``): normalize around
    the principal point, scale the radius by inverseTf(r)/r, re-project.
    """
    x = pts_dist[..., 0] * (1.0 / cam.fx) - cam.cx / cam.fx
    y = pts_dist[..., 1] * (1.0 / cam.fy) - cam.cy / cam.fy
    r = jnp.sqrt(x * x + y * y)
    if cam.s == 0.0:
        factor = jnp.ones_like(r)
    else:
        s_term = 1.0 / (2.0 * jnp.tan(cam.s / 2.0))
        safe_r = jnp.where(r > 0.01, r, 1.0)
        factor = jnp.where(r > 0.01, jnp.tan(safe_r * cam.s) * s_term / safe_r, 1.0)
    xn = factor * x
    yn = factor * y
    return jnp.stack([xn * cam.fx + cam.cx, yn * cam.fy + cam.cy], axis=-1)


def normalize(cam: Camera, pts: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords -> normalized image-plane coords (``camera.cpp:103-127``)."""
    x = pts[..., 0] / cam.fx - cam.cx / cam.fx
    y = pts[..., 1] / cam.fy - cam.cy / cam.fy
    return jnp.stack([x, y], axis=-1)


def denormalize(cam: Camera, pts_n: jnp.ndarray) -> jnp.ndarray:
    x = (pts_n[..., 0] + cam.cx / cam.fx) * cam.fx
    y = (pts_n[..., 1] + cam.cy / cam.fy) * cam.fy
    return jnp.stack([x, y], axis=-1)
