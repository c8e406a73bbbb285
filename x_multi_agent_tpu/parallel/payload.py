"""Inter-agent exchange payloads.

Behavioral spec: reference ``SimpleState`` (``ekf/simple_state.h``) and the
outbound protocol of ``VIO::getDataToSend`` (``vio.cpp:440-451``): dynamic
state, camera position/orientation windows, inverse-depth features,
covariance and anchor indices. Keyframes (``place_recognition/keyframe.h``)
add track descriptors + a VLAD vector for the request-response path.

All agents share the same static dims, so a payload is one fixed-shape
pytree; the exchange is an all_gather over the agents mesh axis instead of
request-response messaging.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ekf.state import StateDims, VisionState
from ..ops import lie


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_pytree_dataclass
class AgentPayload:
    """One agent's broadcastable state snapshot (reference SimpleState).

    Compact wire protocol (deliberate deviation from the reference, which
    ships the full (D, D) covariance, ``simple_state.h:30-75``): the
    receiver only ever uses the peer covariance through (a) per-landmark
    projections H_j P H_j^T for SLAM-SLAM CI and (b) the pose-window
    block for joint-MSCKF CI rows (whose Jacobians are zero outside the
    window columns). Shipping exactly those — ``lm_cov`` (N, 3, 3) and
    ``pose_cov`` (6M, 6M) — carries the same information for every update
    actually performed at ~5x smaller wire size (the mechanism behind
    closing the reference's 89%% bandwidth-reduction claim)."""

    time: jnp.ndarray  # scalar: snapshot time
    p_arr: jnp.ndarray  # (M, 3) camera positions (world)
    q_arr: jnp.ndarray  # (M, 4) camera attitudes
    f_arr: jnp.ndarray  # (N, 3) inverse-depth features
    anchor_idx: jnp.ndarray  # (N,)
    pose_cov: jnp.ndarray  # (6M, 6M) window-pose covariance block
    lm_cov: jnp.ndarray  # (N, N, 3, 3) joint landmark covariance blocks
    n_valid_poses: jnp.ndarray  # int32
    n_valid_features: jnp.ndarray  # int32
    landmarks: jnp.ndarray  # (N, 3) SLAM features in world coords (GT_DEBUG
    # matching + convenience; reference computes them on demand,
    # state_manager.cpp:232-271)
    landmark_valid: jnp.ndarray  # (N,)
    slam_desc: jnp.ndarray  # (N, 32) uint8 descriptors of the SLAM tracks
    slam_desc_valid: jnp.ndarray  # (N,)
    slam_obs: jnp.ndarray  # (N, 2) last normalized observation (for
    # essential-matrix verification of descriptor matches)
    # collaborative track set for cross-agent MSCKF (reference Keyframe
    # msckf/opp track lists, keyframe.h:121-131)
    trk_obs: jnp.ndarray  # (Kt, M, 2)
    trk_mask: jnp.ndarray  # (Kt, M)
    trk_desc: jnp.ndarray  # (Kt, 32) uint8
    trk_desc_valid: jnp.ndarray  # (Kt,)
    # stable track/feature ids (-1 invalid): the GT_DEBUG classification
    # (place_recognition.cpp:387-517) associates cross-agent tracks by
    # ground-truth landmark identity; with sim-assigned global ids, id
    # equality IS that association, made exact
    trk_id: jnp.ndarray  # (Kt,) int32
    slam_id: jnp.ndarray  # (N,) int32


def slam_landmarks_world(dims: StateDims, vision: VisionState):
    """World positions of active SLAM features (reference
    ``computeSLAMCartesianFeaturesForState``)."""
    n = dims.n_features

    def one(f, a):
        rho = jnp.where(jnp.abs(f[2]) > 1e-12, f[2], 1.0)
        bearing = jnp.stack([f[0], f[1], jnp.ones((), f.dtype)])
        a_safe = jnp.maximum(a, 0)
        return lie.quat_to_rot(vision.q_arr[a_safe]) @ bearing / rho + vision.p_arr[a_safe]

    lms = jax.vmap(one)(vision.f_arr, vision.anchor_idx)
    valid = (jnp.arange(n) < vision.n_valid_features) & (vision.anchor_idx >= 0)
    return lms, valid


def landmark_covariances(dims: StateDims, vision: VisionState, cov):
    """(N, N, 3, 3) world-frame JOINT covariance of the SLAM landmarks:
    Lambda_ij = H_i P H_j^T with H_j = d(G_p_f)/d(anchor pos, anchor att,
    ivd) — the exact peer term of the SLAM-SLAM CI update INCLUDING the
    cross-landmark correlations (landmarks of one agent share its pose
    errors; treating them as independent evidence is what made sequential
    per-match fusion overconfident)."""
    from ..vio.updates.multi_slam import _landmark_jac_blocks

    m = dims.n_poses
    dtype = cov.dtype
    n = dims.n_features

    def block(col_r, col_c):
        return jax.lax.dynamic_slice(
            cov, (jnp.asarray(col_r, jnp.int32), jnp.asarray(col_c, jnp.int32)),
            (3, 3),
        )

    def jac_cols(f, a, j):
        a = jnp.maximum(a, 0)
        j_pos, j_att, hf = _landmark_jac_blocks(f, vision.q_arr[a], dtype)
        cols = jnp.stack(
            [15 + 3 * a, 15 + 3 * m + 3 * a, 15 + 6 * m + 3 * j]
        ).astype(jnp.int32)
        return jnp.stack([j_pos, j_att, hf]), cols

    jacs, cols = jax.vmap(jac_cols)(
        vision.f_arr, vision.anchor_idx, jnp.arange(n, dtype=jnp.int32)
    )  # (N, 3, 3, 3), (N, 3)

    def pair(ji, ci, jj, cj):
        lam = jnp.zeros((3, 3), dtype)
        for r in range(3):
            for c in range(3):
                lam = lam + ji[r] @ block(ci[r], cj[c]) @ jj[c].T
        return lam

    return jax.vmap(
        lambda ji, ci: jax.vmap(lambda jj, cj: pair(ji, ci, jj, cj))(jacs, cols)
    )(jacs, cols)


def make_payload(
    dims: StateDims, time, vision: VisionState, cov,
    slam_desc=None, slam_desc_valid=None, slam_obs=None,
    trk_obs=None, trk_mask=None, trk_desc=None, trk_desc_valid=None,
    n_collab_tracks: int = 8,
    trk_id=None, slam_id=None,
) -> AgentPayload:
    lms, valid = slam_landmarks_world(dims, vision)
    n = dims.n_features
    m = dims.n_poses
    if slam_desc is None:
        slam_desc = jnp.zeros((n, 32), jnp.uint8)
        slam_desc_valid = jnp.zeros((n,), bool)
    if slam_obs is None:
        slam_obs = jnp.zeros((n, 2), cov.dtype)
    if trk_obs is None:
        kt = n_collab_tracks
        trk_obs = jnp.zeros((kt, m, 2), cov.dtype)
        trk_mask = jnp.zeros((kt, m), bool)
        trk_desc = jnp.zeros((kt, 32), jnp.uint8)
        trk_desc_valid = jnp.zeros((kt,), bool)
    if trk_id is None:
        trk_id = jnp.full((trk_obs.shape[0],), -1, jnp.int32)
    if slam_id is None:
        slam_id = jnp.full((n,), -1, jnp.int32)
    return AgentPayload(
        time=jnp.asarray(time, cov.dtype),
        p_arr=vision.p_arr,
        q_arr=vision.q_arr,
        f_arr=vision.f_arr,
        anchor_idx=vision.anchor_idx,
        pose_cov=jax.lax.dynamic_slice(cov, (15, 15), (6 * m, 6 * m)),
        lm_cov=landmark_covariances(dims, vision, cov),
        n_valid_poses=vision.n_valid_poses,
        n_valid_features=vision.n_valid_features,
        landmarks=lms,
        landmark_valid=valid,
        slam_desc=slam_desc,
        slam_desc_valid=slam_desc_valid,
        slam_obs=slam_obs,
        trk_obs=trk_obs,
        trk_mask=trk_mask,
        trk_desc=trk_desc,
        trk_desc_valid=trk_desc_valid,
        trk_id=trk_id,
        slam_id=slam_id,
    )
