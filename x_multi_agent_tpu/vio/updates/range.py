"""Laser range-finder (LRF) facet update.

Behavioral spec: reference ``src/x/vio/range_update.cpp`` —
``processRangedFacet``: predicted range from the intersection of the LRF
ray (through a fixed image point) with the plane of a Delaunay facet of
three SLAM features; Jacobians wrt current camera pose and all three
features' anchors + inverse-depth coordinates; chi2(1, 0.90) gate.
One (masked) row.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...ops import lie, linalg
from ...utils.chi2 import chi2_gate
from .common import UpdateRows, feature_col, pose_att_col, pose_pos_col, scatter_block


def build(
    range_meas,  # scalar measured range [m]
    img_pt_n: jnp.ndarray,  # (2,) normalized undistorted LRF image point
    tr_feat_ids: jnp.ndarray,  # (3,) int32 SLAM feature slot indices
    f_arr: jnp.ndarray,  # (N, 3)
    anchor_idx: jnp.ndarray,  # (N,)
    q_arr: jnp.ndarray,  # (M, 4)
    p_arr: jnp.ndarray,  # (M, 3)
    cov: jnp.ndarray,
    cur_pose_idx,
    sigma_range: float,
    active,  # bool: a valid facet was found this frame
) -> UpdateRows:
    m = q_arr.shape[0]
    d = cov.shape[0]
    dtype = cov.dtype

    # triangle features in world coords
    f3 = f_arr[tr_feat_ids]  # (3,3) alpha,beta,rho
    a3 = anchor_idx[tr_feat_ids]  # (3,)
    rho = jnp.where(jnp.abs(f3[:, 2]) > 1e-12, f3[:, 2], 1.0)
    bear = jnp.concatenate([f3[:, :2], jnp.ones((3, 1), dtype)], axis=1)  # (3,3)
    r_wa = lie.quat_to_rot(q_arr[a3])  # (3,3,3)
    p_a = p_arr[a3]
    g_p_f = jnp.einsum("kij,kj->ki", r_wa, bear) / rho[:, None] + p_a  # (3,3)

    q_cur = q_arr[cur_pose_idx]
    p_cur = p_arr[cur_pose_idx]
    r_wc = lie.quat_to_rot(q_cur)

    g_n = jnp.cross(g_p_f[0] - g_p_f[1], g_p_f[2] - g_p_f[1])
    pt_nh = jnp.concatenate([img_pt_n, jnp.ones((1,), dtype)])
    a = (g_p_f[1] - p_cur) @ g_n
    b = pt_nh @ (r_wc.T @ g_n)
    b_safe = jnp.where(jnp.abs(b) > 1e-12, b, 1.0)
    range_hat = a / b_safe
    res = jnp.asarray(range_meas, dtype) - range_hat

    h = jnp.zeros((1, d), dtype)
    j_pc = (-1.0 / b_safe) * g_n[None, :]  # (1,3)
    j_qc = (a / b_safe**2) * (g_n @ r_wc @ lie.skew(pt_nh))[None, :]
    h = scatter_block(h, j_pc, pose_pos_col(cur_pose_idx, m))
    h = scatter_block(h, j_qc, pose_att_col(cur_pose_idx, m))

    g_p_r = (a / b_safe) * (r_wc @ pt_nh) + p_cur
    g_p_bary = jnp.mean(g_p_f, axis=0)

    # per-vertex Jacobians; edge ordering from range_update.cpp:146-205
    others = jnp.array([[2, 1], [0, 2], [1, 0]])
    for j in range(3):
        e = g_p_f[others[j][0]] - g_p_f[others[j][1]]
        j_f = (1.0 / b_safe) * (g_n / 3.0 + jnp.cross(e, g_p_bary - g_p_r))[None, :]
        j_pcj = j_f
        j_qcj = (-1.0 / rho[j]) * j_f @ r_wa[j] @ lie.skew(bear[j])
        mat = jnp.eye(3, dtype=dtype)
        mat = mat.at[0, 2].set(-f3[j, 0] / rho[j])
        mat = mat.at[1, 2].set(-f3[j, 1] / rho[j])
        mat = mat.at[2, 2].set(-1.0 / rho[j])
        j_fij = (1.0 / rho[j]) * j_f @ r_wa[j] @ mat
        h = scatter_block(h, j_pcj, pose_pos_col(a3[j], m))
        h = scatter_block(h, j_qcj, pose_att_col(a3[j], m))
        h = scatter_block(h, j_fij, feature_col(tr_feat_ids[j], m))

    gamma = linalg.mahalanobis_gamma(cov, h / sigma_range, res[None] / sigma_range)
    inlier = chi2_gate(gamma, jnp.asarray(1), 0.90, 4)

    keep = active & inlier & jnp.isfinite(res)
    h = jnp.where(keep, h, 0.0)
    res_out = jnp.where(keep, res, 0.0)[None]
    return UpdateRows(h, res_out, jnp.full((1,), sigma_range, dtype))


def build_per_feature(
    range_meas,  # scalar measured range [m]
    feat_idx,  # int32: SLAM feature slot the LRF is assumed to hit
    f_arr: jnp.ndarray,  # (N, 3)
    anchor_idx: jnp.ndarray,  # (N,)
    q_arr: jnp.ndarray,  # (M, 4)
    p_arr: jnp.ndarray,  # (M, 3)
    cov: jnp.ndarray,
    cur_pose_idx,
    sigma_range: float,
    active,
) -> UpdateRows:
    """Per-feature LRF range row (reference ``processRangedFeature``,
    ``range_update.cpp:267-407`` — present but UNUSED in the reference;
    implemented for parity completeness). Residual: measured range minus
    the z-coordinate of SLAM feature ``feat_idx`` in the current camera
    frame; Jacobians wrt current pose, anchor pose and the feature's
    inverse-depth coordinates (eq. 22-23 lineage). The reference special-
    cases anchor == current pose (only the d/d rho = -1/rho^2 column
    survives — the pose terms cancel exactly); here the general-branch
    algebra reduces to the same row, kept unconditional (verified in
    tests/test_aux_sensors.py against finite differences in both cases).
    One (masked) row; chi2(1, 0.90) gate like the facet variant.
    """
    m = q_arr.shape[0]
    d = cov.shape[0]
    dtype = cov.dtype

    f = f_arr[feat_idx]
    a_idx = anchor_idx[feat_idx]
    a_safe = jnp.maximum(a_idx, 0)
    rho = jnp.where(jnp.abs(f[2]) > 1e-12, f[2], 1.0)
    bear = jnp.stack([f[0], f[1], jnp.ones((), dtype)])
    r_wa = lie.quat_to_rot(q_arr[a_safe])
    g_p_f = r_wa @ bear / rho + p_arr[a_safe]

    q_cur = q_arr[cur_pose_idx]
    p_cur = p_arr[cur_pose_idx]
    r_wc = lie.quat_to_rot(q_cur)
    pt_cam = r_wc.T @ (g_p_f - p_cur)
    res = jnp.asarray(range_meas, dtype) - pt_cam[2]

    # J_i = d(range_hat)/d(pt_cam) = [0, 0, 1]
    j_i = jnp.zeros((1, 3), dtype).at[0, 2].set(1.0)
    j_att = j_i @ lie.skew(pt_cam)  # current attitude
    j_pos = -j_i @ r_wc.T  # current position
    j_anchor_pos = -j_pos
    j_anchor_att = (-1.0 / rho) * j_i @ r_wc.T @ r_wa @ lie.skew(bear)
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    mat = jnp.stack(
        [
            jnp.stack([one, zero, -f[0] / rho]),
            jnp.stack([zero, one, -f[1] / rho]),
            jnp.stack([zero, zero, -1.0 / rho]),
        ]
    )
    j_f = (1.0 / rho) * j_i @ r_wc.T @ r_wa @ mat

    h = jnp.zeros((1, d), dtype)
    h = scatter_block(h, j_pos, pose_pos_col(cur_pose_idx, m))
    h = scatter_block(h, j_att, pose_att_col(cur_pose_idx, m))
    h = scatter_block(h, j_anchor_pos, pose_pos_col(a_safe, m))
    h = scatter_block(h, j_anchor_att, pose_att_col(a_safe, m))
    h = scatter_block(h, j_f, feature_col(feat_idx, m))

    gamma = linalg.mahalanobis_gamma(cov, h / sigma_range, res[None] / sigma_range)
    inlier = chi2_gate(gamma, jnp.asarray(1), 0.90, 4)

    keep = active & inlier & jnp.isfinite(res) & (a_idx >= 0)
    h = jnp.where(keep, h, 0.0)
    res_out = jnp.where(keep, res, 0.0)[None]
    return UpdateRows(h, res_out, jnp.full((1,), sigma_range, dtype))
