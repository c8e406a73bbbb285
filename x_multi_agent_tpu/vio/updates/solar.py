"""Sun-sensor angle update.

Behavioral spec: reference ``src/x/vio/solar_update.cpp`` — 2-dof sun angle
residual vs the IMU attitude. The sensor extrinsics / world sun vector /
noise are configurable here (the reference hard-codes them,
``solar_update.cpp:39-57``; those values are the defaults).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ...ops import lie
from .common import UpdateRows

RAD2DEG = 57.2957795130


class SolarCalib(NamedTuple):
    q_si: Tuple[float, float, float, float] = (
        0.360346005598587,
        -0.063338979194957,
        0.007502445522018,
        0.930635612981541,
    )  # sun sensor <- IMU, xyzw
    sun_w: Tuple[float, float, float] = (
        -0.29385515271891938,
        -0.55080445540063927,
        0.78119370269565391,
    )  # sun direction in world (normalized below)
    var_sun_angle: float = 10000 * 0.01777777777  # [deg^2]


def build(
    angles: jnp.ndarray,  # (2,) measured sun angles [deg]
    q_imu: jnp.ndarray,  # (4,) current IMU attitude (world<-body)
    cov: jnp.ndarray,
    active,
    calib: SolarCalib = SolarCalib(),
) -> UpdateRows:
    d = cov.shape[0]
    dtype = cov.dtype
    q_si = jnp.asarray(calib.q_si, dtype)
    sun_w = jnp.asarray(calib.sun_w, dtype)
    sun_w = sun_w / jnp.linalg.norm(sun_w)

    r_si = lie.quat_to_rot(q_si)
    r_wb = lie.quat_to_rot(q_imu)
    s_sun = r_si.T @ (r_wb.T @ sun_w)
    s_sun = s_sun / jnp.linalg.norm(s_sun)

    pred = RAD2DEG * jnp.stack(
        [jnp.arctan2(s_sun[0], s_sun[2]), jnp.arctan2(s_sun[1], s_sun[2])]
    )
    res = angles.astype(dtype) - pred

    den0 = s_sun[0] ** 2 + s_sun[2] ** 2
    den1 = s_sun[1] ** 2 + s_sun[2] ** 2
    mat = jnp.zeros((2, 3), dtype)
    mat = mat.at[0, 0].set(s_sun[2] / den0)
    mat = mat.at[1, 1].set(s_sun[2] / den1)
    mat = mat.at[0, 2].set(-s_sun[0] / den0)
    mat = mat.at[1, 2].set(-s_sun[1] / den1)

    j_att = RAD2DEG * mat @ r_si.T @ lie.skew(r_wb.T @ sun_w)
    h = jnp.zeros((2, d), dtype).at[:, 6:9].set(j_att)

    # no chi2 gate in the reference solar update
    sigma = jnp.sqrt(jnp.asarray(calib.var_sun_angle, dtype))
    keep = active & jnp.isfinite(res).all()
    h = jnp.where(keep, h, 0.0)
    res = jnp.where(keep, res, 0.0)
    return UpdateRows(h, res, jnp.full((2,), sigma, dtype))
