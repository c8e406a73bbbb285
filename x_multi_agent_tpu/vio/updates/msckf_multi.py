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

Two entry points:
  * :func:`apply_joint_msckf_ci` — live descriptor matching against a
    shared peer set (one payload per peer), used by the same-round
    collaborative fusion.
  * :func:`apply_joint_msckf_ci_pairs` — explicit per-own-track peer
    associations (peer data gathered per track), used by the persistent
    match store (reference ``msckf_matches_`` consumed at the next visual
    update, ``msckf_update.cpp:90-143``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ekf import ci as ci_mod
from ...ekf.state import StateDims, correct_core, correct_vision
from ...ops.linalg import highprec
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


@highprec
def apply_joint_msckf_ci_pairs(
    dims: StateDims,
    core,
    vision,
    cov: jnp.ndarray,
    own_obs: jnp.ndarray,  # (K, M, 2) own MSCKF tracks (window-aligned)
    own_mask: jnp.ndarray,  # (K, M)
    own_inlier: jnp.ndarray,  # (K,) own-track gate
    peer_p_arr: jnp.ndarray,  # (K, P, M, 3) per-track peer camera windows
    peer_q_arr: jnp.ndarray,  # (K, P, M, 4)
    peer_cov: jnp.ndarray,  # (K, P, 6M, 6M) peer pose-window cov blocks
    peer_obs: jnp.ndarray,  # (K, P, M, 2) matched peer track obs
    peer_mask: jnp.ndarray,  # (K, P, M)
    matched: jnp.ndarray,  # (K, P) association valid
    sigma_img: float,
    ci_msckf_w: float,
    oc: bool = True,
    own_q_arr=None,  # optional own window override (short-track path uses
    own_p_arr=None,  # the pre-slide pose list, updater.cpp:52-75)
):
    """Sequentially CI-fuse explicitly matched joint-MSCKF tracks.

    Returns (core, vision, cov, n_applied).
    """
    k, m, _ = own_obs.shape
    p_max = peer_p_arr.shape[1]
    d = cov.shape[0]
    dtype = cov.dtype
    g_vec = jnp.asarray(GRAVITY, dtype)
    var_img = sigma_img * sigma_img

    def one_track(carry, kidx):
        core, vision, cov, n_app = carry
        # own window: the carry's (corrected) vision state by default, so
        # each track re-linearizes against the latest estimate; the
        # short-track path overrides with the static pre-slide pose list.
        q_own = vision.q_arr if own_q_arr is None else own_q_arr
        p_own = vision.p_arr if own_p_arr is None else own_p_arr

        oobs = own_obs[kidx]
        omask = own_mask[kidx]
        tmatched = matched[kidx]  # (P,)
        pobs = peer_obs[kidx]  # (P, M, 2)
        pmask = peer_mask[kidx] & tmatched[:, None]
        pq = peer_q_arr[kidx]  # (P, M, 4)
        pp = peer_p_arr[kidx]  # (P, M, 3)
        # compact protocol: the peer ships only its pose-window covariance
        # block (payload.py) — the joint rows are zero outside those
        # columns, so H_p P H_p^T only ever reads this block
        pcov = peer_cov[kidx]  # (P, 6M, 6M)

        # joint triangulation: peers first, own last (anchor = own last obs)
        obs_joint = jnp.concatenate([pobs.reshape(-1, 2), oobs], axis=0)
        mask_joint = jnp.concatenate([pmask.reshape(-1), omask], axis=0)
        q_joint = jnp.concatenate([pq.reshape(-1, 4), q_own], axis=0)
        p_joint = jnp.concatenate([pp.reshape(-1, 3), p_own], axis=0)
        ivd, anchor = triangulation.triangulate_gn(
            obs_joint, mask_joint, q_joint, p_joint
        )
        g_p_f = triangulation.ivd_to_world(ivd, q_joint[anchor], p_joint[anchor])

        h_own, hf_own, r_own, fin_own = _participant_rows(
            g_p_f, oobs, omask, q_own, p_own, g_vec,
            dims.n_features, oc, dtype,
        )

        def peer_rows(pq1, pp1, po1, pm1):
            return _participant_rows(
                g_p_f, po1, pm1, pq1, pp1, g_vec, dims.n_features, oc, dtype
            )

        h_p, hf_p, r_p, fin_p = jax.vmap(peer_rows)(pq, pp, pobs, pmask)

        # joint nullspace projection over the stacked feature Jacobian
        hf_stack = jnp.concatenate([hf_own[None], hf_p], axis=0).reshape(
            3 * (p_max + 1), 3
        )
        r_stack = jnp.concatenate([r_own[None], r_p], axis=0).reshape(-1)
        eye_stack = jnp.eye(3 * (p_max + 1), dtype=dtype)
        _, qt, res_t = linalg.householder_qt(hf_stack, eye_stack, r_stack)
        a = qt[3:].T  # (3(P+1), rows)
        rows = a.shape[1]
        res_proj = res_t[3:]
        h_own_proj = a[:3].T @ h_own  # (rows, D)
        h_p_proj = jnp.stack(
            [a[3 * (i + 1) : 3 * (i + 2)].T @ h_p[i] for i in range(p_max)]
        )  # (P, rows, D)

        # N-way CI: S = (1/w0) Ho P Ho^T + sum (1/wi) Hp Pp Hp^T + var I.
        # Negative ci_msckf_w requests online weight optimization
        # (reference NLopt COBYLA path, ci.cpp:49-92,143-190), replaced by
        # a fixed-point simplex iteration on device.
        n_peers = jnp.sum(tmatched)
        if ci_msckf_w < 0:
            w_fb = -ci_msckf_w
            m_own = h_own_proj @ jnp.linalg.inv(cov) @ h_own_proj.T
            m_p = jax.vmap(
                lambda hp, pc: hp @ jnp.linalg.inv(pc) @ hp.T
            )(h_p_proj[:, :, 15 : 15 + 6 * m], pcov)
            w_all = ci_mod.optimize_weights_nway(m_own, m_p, tmatched, w_fb)
            w0 = w_all[0]
            w_peers = jnp.maximum(w_all[1:], 1e-4)
        else:
            w0 = 1.0 - n_peers * ci_msckf_w
            w_peers = jnp.full((p_max,), ci_msckf_w, dtype)
        s = (1.0 / w0) * h_own_proj @ cov @ h_own_proj.T
        hp_pose = h_p_proj[:, :, 15 : 15 + 6 * m]  # (P, rows, 6M)
        for i in range(p_max):
            s_i = hp_pose[i] @ pcov[i] @ hp_pose[i].T
            s = s + jnp.where(tmatched[i], (1.0 / w_peers[i]), 0.0) * s_i
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
            # Inflate the observing poses' position/attitude states
            # (msckf_update.cpp:256-266). Congruence form sqrt(w_result) on
            # involved rows+cols (not the reference's diagonal-blocks-only
            # inflation) so ci_P stays PSD and H ci_P H^T matches the own
            # term of S exactly — see multi_slam.py for the rationale.
            pose_scaled = jnp.concatenate([omask, omask])  # (2m,) pos+att slots
            scale = jnp.ones((d,), dtype)
            sq = jnp.sqrt(jnp.asarray(w_result, dtype))
            scale = scale.at[15 : 15 + 6 * m].set(
                jnp.where(jnp.repeat(pose_scaled, 3), sq, 1.0)
            )
            ci_p = cov * scale[:, None] * scale[None, :]
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


@highprec
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
    peer_cov: jnp.ndarray,  # (P, 6M, 6M) peer pose-window cov blocks
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
    """Descriptor-match own tracks to each peer's collaborative set, then
    CI-fuse (same-round path). Returns (core, vision, cov, n_applied)."""
    from ...place_recognition.descriptors import hamming_matrix

    k = own_obs.shape[0]
    p_max = peer_p_arr.shape[0]

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

    # gather per-own-track peer data: (K, P, ...)
    bidx = peer_best.T  # (K, P)
    parange = jnp.arange(p_max)
    pobs = peer_trk_obs[parange[None, :], bidx]  # (K, P, M, 2)
    pmask = peer_trk_mask[parange[None, :], bidx]  # (K, P, M)
    brd = lambda x: jnp.broadcast_to(x[None], (k,) + x.shape)
    return apply_joint_msckf_ci_pairs(
        dims, core, vision, cov, own_obs, own_mask, own_inlier,
        brd(peer_p_arr), brd(peer_q_arr), brd(peer_cov),
        pobs, pmask, peer_ok.T,
        sigma_img, ci_msckf_w, oc=oc,
    )
