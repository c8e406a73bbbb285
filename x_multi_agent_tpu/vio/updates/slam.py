"""SLAM (persistent inverse-depth feature) update.

Behavioral spec: reference ``src/x/vio/slam_update.cpp``. For each active
SLAM feature with a fresh observation: residual of the last observation vs
the inverse-depth prediction from the anchor pose; Jacobians wrt current
pose, anchor pose and feature coordinates (anchor == current pose special
case, ``slam_update.cpp:115-127``); chi2(2 * track_length, 0.90) gate.

Fixed-shape: vmapped over the N feature slots; inactive/gated slots yield
zero rows.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import lie, linalg
from ...utils.chi2 import chi2_gate
from .common import UpdateRows, feature_col, pose_att_col, pose_pos_col, projection_blocks, scatter_block


@linalg.highprec  # residual precision (see msckf.build note)
def build(
    f_arr: jnp.ndarray,  # (N, 3) inverse-depth (alpha, beta, rho)
    anchor_idx: jnp.ndarray,  # (N,) int32 window index of anchor pose
    q_arr: jnp.ndarray,  # (M, 4) camera attitudes (world<-cam)
    p_arr: jnp.ndarray,  # (M, 3) camera positions
    z_obs: jnp.ndarray,  # (N, 2) last (current-frame) normalized observation
    active: jnp.ndarray,  # (N,) bool: feature has an observation this frame
    track_length: jnp.ndarray,  # (N,) int32 for the chi2 dof (2 * len)
    cov: jnp.ndarray,  # (D, D) prior covariance (for the gate)
    cur_pose_idx,  # traced int: index of the current pose in the window
    sigma_img: float,
    max_track_length: int = 60,
) -> UpdateRows:
    m = q_arr.shape[0]
    n = f_arr.shape[0]
    d = cov.shape[0]
    dtype = cov.dtype

    q_cur = q_arr[cur_pose_idx]
    p_cur = p_arr[cur_pose_idx]
    r_wc_cur = lie.quat_to_rot(q_cur)

    def one_feature(f, a_idx, z, j):
        alpha, beta, rho = f[0], f[1], f[2]
        q_a = q_arr[a_idx]
        p_a = p_arr[a_idx]
        safe_rho = jnp.where(jnp.abs(rho) > 1e-12, rho, 1.0)
        bearing = jnp.stack([alpha, beta, jnp.ones((), dtype)])
        g_p_f = lie.quat_to_rot(q_a) @ bearing / safe_rho + p_a

        pt_cam = r_wc_cur.T @ (g_p_f - p_cur)
        j_i, pred, finite = projection_blocks(pt_cam, dtype)
        res_j = z - pred

        h = jnp.zeros((2, d), dtype)

        # anchor == current pose special case (slam_update.cpp:115-127):
        # rows are just [[1,0,0],[0,1,0]] on the feature block
        is_anchor_cur = a_idx == cur_pose_idx
        eye_blk = jnp.zeros((2, 3), dtype).at[0, 0].set(1.0).at[1, 1].set(1.0)

        # general case Jacobians (slam_update.cpp:129-187)
        j_att = j_i @ lie.skew(pt_cam)
        j_pos = -j_i @ r_wc_cur.T
        j_anchor_att = (
            -1.0
            / safe_rho
            * j_i
            @ r_wc_cur.T
            @ lie.quat_to_rot(q_a)
            @ lie.skew(bearing)
        )
        j_anchor_pos = -j_pos
        mat = jnp.eye(3, dtype=dtype)
        mat = mat.at[0, 2].set(-alpha / safe_rho)
        mat = mat.at[1, 2].set(-beta / safe_rho)
        mat = mat.at[2, 2].set(-1.0 / safe_rho)
        hf = (1.0 / safe_rho) * j_i @ r_wc_cur.T @ lie.quat_to_rot(q_a) @ mat

        h_gen = jnp.zeros((2, d), dtype)
        h_gen = scatter_block(h_gen, j_pos, pose_pos_col(cur_pose_idx, m))
        h_gen = scatter_block(h_gen, j_att, pose_att_col(cur_pose_idx, m))
        h_gen = scatter_block(h_gen, j_anchor_pos, pose_pos_col(a_idx, m))
        h_gen = scatter_block(h_gen, j_anchor_att, pose_att_col(a_idx, m))
        h_gen = scatter_block(h_gen, hf, feature_col(j, m))

        h_special = scatter_block(h, eye_blk, feature_col(j, m))
        h_j = jnp.where(is_anchor_cur, h_special, h_gen)
        return h_j, res_j, finite

    h_all, res_all, finite = jax.vmap(one_feature)(
        f_arr, anchor_idx, z_obs, jnp.arange(n, dtype=jnp.int32)
    )

    # chi2(2 * track_size, 0.90) gate per feature (slam_update.cpp:189-213)
    var_img = sigma_img * sigma_img
    whitened_h = h_all / sigma_img
    whitened_res = res_all / sigma_img
    gamma = jax.vmap(lambda hh, rr: linalg.mahalanobis_gamma(cov, hh, rr))(
        whitened_h, whitened_res
    )
    inlier = chi2_gate(gamma, 2 * track_length, 0.90, 2 * max_track_length)

    keep = (active & inlier & finite)[:, None]
    h_out = jnp.where(keep[:, :, None], h_all, 0.0).reshape(2 * n, d)
    res_out = jnp.where(keep, res_all, 0.0).reshape(2 * n)
    noise = jnp.full((2 * n,), sigma_img, dtype)
    return UpdateRows(h_out, res_out, noise)
