"""Cross-agent (multi-UAV) MSCKF update with N-way covariance intersection.

Behavioral spec: reference ``msckf_update.cpp:46-279`` (MULTI_UAV path):
for an own MSCKF track matched (by descriptor) to tracks received from
peers,
  * the landmark is triangulated JOINTLY over all participants'
    observations and camera windows (peers first, own last — the anchor
    stays the own last observation; ``msckf_update.cpp:90-143``)
  * each participant contributes the column-space projection of its
    reprojection system onto its feature Jacobian: 3 rows (Q1^T H_i,
    Q1^T Hf_i, Q1^T res_i) in its own state layout
  * the stacked feature Jacobian (3(P+1), 3) is nullspace-projected
    jointly (``nullSpaceProjection``), the projected rows split per state
  * S = sum_i (1/w_i) H_i P_i H_i^T + var I with fixed CI weights
    (w_0 = 1 - P*w_other), chi2(2*m_total - 3, 0.95) gate, own covariance
    inflated by w_result on the observing pose blocks, then applyCI
    (``msckf_update.cpp:175-279``).

Fixed shapes: P_MAX peer slots per track; missing peers contribute zero
rows (harmless under the orthogonal projections).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ekf import ci as ci_mod
from ...ekf.state import StateDims, correct_core, correct_vision
from ...ops import linalg, triangulation
from ...utils.chi2 import chi2_gate
from ..updates.msckf import _assemble_h, _obs_jacobians, GRAVITY


def _participant_rows(g_p_f, obs, mask, q_arr, p_arr, g_vec, n_features, oc, dtype):
    """One participant's column-space projections: (3, D), (3, 3), (3,)."""
    m = obs.shape[0]
    res, j_pos, j_att, hf, finite = _obs_jacobians(
        g_p_f, obs, mask, q_arr, p_arr, g_vec, oc=oc
    )
    h = _assemble_h(j_pos, j_att, m, n_features, dtype)
    hf_flat = hf.reshape(2 * m, 3)
    res_flat = res.reshape(2 * m)
    hf_t, h_t, res_t = linalg.householder_qt(hf_flat, h, res_flat)
    return h_t[:3], hf_t[:3], res_t[:3], finite


def apply_joint_msckf_ci(
    dims: StateDims,
    core,
    vision,
    cov: jnp.ndarray,
    own_obs: jnp.ndarray,  # (K, M, 2) own MSCKF tracks (window-aligned)
    own_mask: jnp.ndarray,  # (K, M)
    own_inlier: jnp.ndarray,  # (K,) own-track MSCKF gate passed
    own_desc: jnp.ndarray,  # (K, 32)
    own_desc_valid: jnp.ndarray,  # (K,)
    peer_p_arr: jnp.ndarray,  # (P, M, 3)
    peer_q_arr: jnp.ndarray,  # (P, M, 4)
    peer_cov: jnp.ndarray,  # (P, D, D)
    peer_trk_obs: jnp.ndarray,  # (P, Kt, M, 2)
    peer_trk_mask: jnp.ndarray,  # (P, Kt, M)
    peer_trk_desc: jnp.ndarray,  # (P, Kt, 32)
    peer_trk_desc_valid: jnp.ndarray,  # (P, Kt)
    peer_valid: jnp.ndarray,  # (P,)
    sigma_img: float,
    ci_msckf_w: float,
    oc: bool = True,
    desc_abs_thr: float = 60.0,
):
    """Sequentially CI-fuse matched joint-MSCKF tracks. Returns
    (core, vision, cov, n_applied)."""
    from ...place_recognition.descriptors import hamming_matrix

    k, m, _ = own_obs.shape
    p_max = peer_p_arr.shape[0]
    d = cov.shape[0]
    dtype = cov.dtype
    g_vec = jnp.asarray(GRAVITY, dtype)
    var_img = sigma_img * sigma_img

    # descriptor matching own tracks x each peer's collaborative tracks
    def match_peer(trk_desc, trk_valid):
        dmat = hamming_matrix(own_desc, trk_desc)  # (K, Kt)
        big = jnp.iinfo(jnp.int32).max
        dmat = jnp.where(trk_valid[None, :], dmat, big)
        best = jnp.argmin(dmat, axis=1)
        ok = (dmat[jnp.arange(k), best] < desc_abs_thr) & own_desc_valid
        return best.astype(jnp.int32), ok

    peer_best, peer_ok = jax.vmap(match_peer)(peer_trk_desc, peer_trk_desc_valid)
    peer_ok = peer_ok & peer_valid[:, None]  # (P, K)

    def one_track(carry, kidx):
        core, vision, cov, n_app = carry

        oobs = own_obs[kidx]
        omask = own_mask[kidx]
        matched = peer_ok[:, kidx]  # (P,)
        pobs = jnp.stack(
            [peer_trk_obs[p, peer_best[p, kidx]] for p in range(p_max)]
        )  # (P, M, 2)
        pmask = jnp.stack(
            [peer_trk_mask[p, peer_best[p, kidx]] for p in range(p_max)]
        ) & matched[:, None]

        # joint triangulation: peers first, own last (anchor = own last obs)
        obs_joint = jnp.concatenate([pobs.reshape(-1, 2), oobs], axis=0)
        mask_joint = jnp.concatenate([pmask.reshape(-1), omask], axis=0)
        q_joint = jnp.concatenate(
            [peer_q_arr.reshape(-1, 4), vision.q_arr], axis=0
        )
        p_joint = jnp.concatenate(
            [peer_p_arr.reshape(-1, 3), vision.p_arr], axis=0
        )
        ivd, anchor = triangulation.triangulate_gn(
            obs_joint, mask_joint, q_joint, p_joint
        )
        g_p_f = triangulation.ivd_to_world(ivd, q_joint[anchor], p_joint[anchor])

        # participant rows: own first in the stacked feature system? The
        # reference stacks own at block 0 then peers (msckf_update.cpp:160).
        h_own, hf_own, r_own, fin_own = _participant_rows(
            g_p_f, oobs, omask, vision.q_arr, vision.p_arr, g_vec,
            dims.n_features, oc, dtype,
        )

        def peer_rows(pq, pp, po, pm):
            return _participant_rows(
                g_p_f, po, pm, pq, pp, g_vec, dims.n_features, oc, dtype
            )

        h_p, hf_p, r_p, fin_p = jax.vmap(peer_rows)(
            peer_q_arr, peer_p_arr, pobs, pmask
        )

        # joint nullspace projection over the stacked feature Jacobian
        hf_stack = jnp.concatenate([hf_own[None], hf_p], axis=0).reshape(
            3 * (p_max + 1), 3
        )
        r_stack = jnp.concatenate([r_own[None], r_p], axis=0).reshape(-1)
        # apply Q^T via Householder reflections; rows 3: span the left
        # nullspace of the stacked feature Jacobian
        eye_stack = jnp.eye(3 * (p_max + 1), dtype=dtype)
        _, qt, res_t = linalg.householder_qt(hf_stack, eye_stack, r_stack)
        a = qt[3:].T  # (3(P+1), rows)
        rows = a.shape[1]
        res_proj = res_t[3:]
        # per-state projected blocks
        h_own_proj = a[:3].T @ h_own  # (rows, D)
        h_p_proj = jnp.stack(
            [a[3 * (i + 1) : 3 * (i + 2)].T @ h_p[i] for i in range(p_max)]
        )  # (P, rows, D)

        # N-way CI: S = (1/w0) Ho P Ho^T + sum (1/w) Hp Pp Hp^T + var I
        n_peers = jnp.sum(matched)
        w0 = 1.0 - n_peers * ci_msckf_w
        s = (1.0 / w0) * h_own_proj @ cov @ h_own_proj.T
        for i in range(p_max):
            s_i = h_p_proj[i] @ peer_cov[i] @ h_p_proj[i].T
            s = s + jnp.where(matched[i], (1.0 / ci_msckf_w), 0.0) * s_i
        s = s + var_img * jnp.eye(rows, dtype=dtype)

        gamma = res_proj @ jnp.linalg.solve(s, res_proj)
        n_obs_total = jnp.sum(mask_joint)
        dof = 2 * n_obs_total - 3
        ok = (
            own_inlier[kidx]
            & (n_peers > 0)
            & chi2_gate(gamma, dof, 0.95, 2 * (p_max + 1) * m)
            & fin_own
            & jnp.isfinite(gamma)
        )

        def do(args):
            core, vision, cov = args
            w_result = 1.0 / w0
            # inflate the 3x3 diagonal blocks of the observing poses'
            # position/attitude states (msckf_update.cpp:256-266)
            slot_id = jnp.full((d,), -1, jnp.int32)
            slot_id = slot_id.at[15 : 15 + 3 * m].set(jnp.arange(3 * m) // 3)
            slot_id = slot_id.at[15 + 3 * m : 15 + 6 * m].set(
                m + jnp.arange(3 * m) // 3
            )
            slot_scaled = jnp.concatenate([omask, omask])  # (2m,)
            r_id = slot_id[:, None]
            c_id = slot_id[None, :]
            blkmask = (
                (r_id == c_id)
                & (r_id >= 0)
                & slot_scaled[jnp.clip(r_id, 0, 2 * m - 1)]
            )
            ci_p = jnp.where(blkmask, cov * w_result, cov)
            corr, cov1 = ci_mod.apply_ci(cov, ci_p, h_own_proj, res_proj, s)
            return correct_core(core, corr), correct_vision(vision, corr, dims), cov1

        core, vision, cov = jax.lax.cond(ok, do, lambda x: x, (core, vision, cov))
        return (core, vision, cov, n_app + ok.astype(jnp.int32)), None

    (core, vision, cov, n_app), _ = jax.lax.scan(
        one_track,
        (core, vision, cov, jnp.asarray(0, jnp.int32)),
        jnp.arange(k),
    )
    return core, vision, cov, n_app
