"""MSCKF-SLAM hybrid update (Li 2012).

Behavioral spec: reference ``src/x/vio/msckf_slam_update.cpp``. Like the
MSCKF update but (a) the feature is about to be *initialized* into the
state anchored at the current (last) pose, so the last observation's rows
carry only Hf = [[1,0,0],[0,1,0]] and every other observation also carries
anchor-pose Jacobians; (b) alongside the nullspace-projected Kalman rows it
saves the column-space projections H1 = U^T H, H2 = U^T Hf, r1 = U^T res
used for in-update feature initialization
(``msckf_slam_update.cpp:200-232``, consumed by
``StateManager::initMsckfSlamFeatures``). No OC projection (matches ref).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import lie, linalg, triangulation
from ...utils.chi2 import chi2_gate
from .common import UpdateRows, projection_blocks


class MsckfSlamInit(NamedTuple):
    """Per-track feature-initialization matrices (reference MsckfSlamMatrices)."""

    h1: jnp.ndarray  # (K, 3, D)
    h2: jnp.ndarray  # (K, 3, 3)
    r1: jnp.ndarray  # (K, 3)
    features: jnp.ndarray  # (K, 3) triangulated inverse depth (anchor = cur pose)
    inlier: jnp.ndarray  # (K,) bool
    world: jnp.ndarray  # (K, 3)
    anchor: jnp.ndarray  # (K,) int32 anchor window index


@linalg.highprec  # residual precision (see msckf.build note)
def build(
    obs: jnp.ndarray,  # (K, M, 2)
    mask: jnp.ndarray,  # (K, M) — last valid obs must be the current pose
    q_arr: jnp.ndarray,
    p_arr: jnp.ndarray,
    cov: jnp.ndarray,
    sigma_img: float,
    n_features: int,
    max_iter: int = 10,
    term: float = 1e-5,
    fixed_tri=None,
):
    """``fixed_tri`` = (ivd (K,3), anchor (K,)): reuse a previous call's
    triangulation instead of re-triangulating — required for IEKF
    iterations > 0 (see msckf.build). The relative (anchor-referenced)
    parametrization keeps its anchor-pose Jacobians, so only the (ivd,
    anchor) pair is frozen; the world point tracks the corrected anchor
    pose consistently."""
    k, m, _ = obs.shape
    dtype = cov.dtype
    d = cov.shape[0]

    def one_track(obs_k, mask_k, ivd_f, anchor_f):
        n_obs = jnp.sum(mask_k)
        enough = n_obs >= 2
        if fixed_tri is None:
            ivd, anchor = triangulation.triangulate_gn(
                obs_k, mask_k, q_arr, p_arr, max_iter=max_iter, term=term
            )
        else:
            ivd, anchor = ivd_f, anchor_f
        alpha, beta, rho = ivd[0], ivd[1], ivd[2]
        safe_rho = jnp.where(jnp.abs(rho) > 1e-12, rho, 1.0)
        q_a = q_arr[anchor]
        p_a = p_arr[anchor]
        r_wa = lie.quat_to_rot(q_a)
        bearing = jnp.stack([alpha, beta, jnp.ones((), dtype)])
        g_p_f = r_wa @ bearing / safe_rho + p_a

        r_wc = lie.quat_to_rot(q_arr)
        is_last = jnp.arange(m) == anchor

        def per_obs(r_wc_i, p_i, z_i, m_i, last_i):
            pt_cam = r_wc_i.T @ (g_p_f - p_i)
            j_i, pred, ok = projection_blocks(pt_cam)
            res = z_i - pred
            j_pos = -j_i @ r_wc_i.T
            j_att = j_i @ lie.skew(pt_cam)
            j_anchor_att = (
                -1.0 / safe_rho * j_i @ r_wc_i.T @ r_wa @ lie.skew(bearing)
            )
            j_anchor_pos = -j_pos
            mat = jnp.eye(3, dtype=dtype)
            mat = mat.at[0, 2].set(-alpha / safe_rho)
            mat = mat.at[1, 2].set(-beta / safe_rho)
            mat = mat.at[2, 2].set(-1.0 / safe_rho)
            hf = (1.0 / safe_rho) * j_i @ r_wc_i.T @ r_wa @ mat

            hf_last = jnp.zeros((2, 3), dtype).at[0, 0].set(1.0).at[1, 1].set(1.0)
            zero23 = jnp.zeros((2, 3), dtype)
            # last obs: only Hf = [[1,0,0],[0,1,0]]; no pose/anchor blocks
            j_pos = jnp.where(last_i, zero23, j_pos)
            j_att = jnp.where(last_i, zero23, j_att)
            j_anchor_pos = jnp.where(last_i, zero23, j_anchor_pos)
            j_anchor_att = jnp.where(last_i, zero23, j_anchor_att)
            hf = jnp.where(last_i, hf_last, hf)

            keep = m_i
            out = [res, j_pos, j_att, j_anchor_pos, j_anchor_att, hf]
            out = [jnp.where(keep, o, jnp.zeros_like(o)) for o in out]
            return (*out, ok | ~m_i)

        res, j_pos, j_att, j_apos, j_aatt, hf, ok = jax.vmap(per_obs)(
            r_wc, p_arr, obs_k, mask_k, is_last
        )
        finite = ok.all()

        # assemble (2M, D): own-slot pose blocks + anchor-slot (current pose)
        eye_m = jnp.eye(m, dtype=dtype)
        anchor_onehot = (jnp.arange(m) == anchor).astype(dtype)  # (m,)
        pos_big = jnp.einsum("mab,mn->manb", j_pos, eye_m)
        pos_big = pos_big + jnp.einsum("mab,n->manb", j_apos, anchor_onehot)
        att_big = jnp.einsum("mab,mn->manb", j_att, eye_m)
        att_big = att_big + jnp.einsum("mab,n->manb", j_aatt, anchor_onehot)
        h = jnp.concatenate(
            [
                jnp.zeros((m, 2, 15), dtype),
                pos_big.reshape(m, 2, 3 * m),
                att_big.reshape(m, 2, 3 * m),
                jnp.zeros((m, 2, 3 * n_features), dtype),
            ],
            axis=-1,
        ).reshape(2 * m, d)

        hf_flat = hf.reshape(2 * m, 3)
        res_flat = res.reshape(2 * m)
        h0, res0, h1, (r1, h2) = linalg.nullspace_project(hf_flat, h, res_flat)

        gamma = linalg.mahalanobis_gamma(cov, h0 / sigma_img, res0 / sigma_img)
        dof = 2 * n_obs - 3
        inlier = chi2_gate(gamma, dof, 0.95, 2 * m) & enough & finite & jnp.isfinite(gamma)

        h0 = jnp.where(inlier, h0, 0.0)
        res0 = jnp.where(inlier, res0, 0.0)
        return h0, res0, h1, h2, r1, ivd, g_p_f, inlier, anchor

    if fixed_tri is None:
        tri_in = (jnp.zeros((k, 3), dtype), jnp.zeros((k,), jnp.int32))
    else:
        tri_in = fixed_tri
    h0, res0, h1, h2, r1, ivd, world, inlier, anchor = jax.vmap(one_track)(
        obs, mask, *tri_in
    )

    rows = k * (2 * m - 3)
    update = UpdateRows(
        jac=h0.reshape(rows, d),
        res=res0.reshape(rows),
        noise_std=jnp.full((rows,), sigma_img, dtype),
    )
    init = MsckfSlamInit(
        h1=h1, h2=h2, r1=r1, features=ivd, inlier=inlier, world=world,
        anchor=anchor,
    )
    return update, init
