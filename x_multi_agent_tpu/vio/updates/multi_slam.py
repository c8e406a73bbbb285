"""Cross-agent SLAM-SLAM update with covariance intersection.

Behavioral spec: reference ``src/x/vio/multi_slam_update.cpp`` +
``Updater::applyCI`` (``updater.cpp:144-161``): for each matched pair of
SLAM landmarks (own feature j, peer feature j'):
  residual = other_G_p_f - G_p_f           (3-dof landmark difference)
  own Jacobian wrt (anchor pos, anchor att, feature ivd)
  peer Jacobian likewise (negated)
  chi2(3, 0.90) gate
  pairwise CI: S = 1/(1-w) H P H^T + 1/w H' P' H'^T + var*I ; own anchor +
  feature diagonal blocks inflated by w_result = 1/(1-w)
  sequential applyCI per match (each updates the covariance).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...ekf import ci as ci_mod
from ...ekf.state import StateDims, VisionState, correct_core, correct_vision
from ...ops.linalg import highprec
from ...ops import lie, linalg
from ...utils.chi2 import chi2_gate


def _landmark_jac_blocks(f, q_a, dtype):
    """(J_anchor_pos, J_anchor_att, Hf) of d(G_p_f)/d(anchor, ivd)."""
    alpha, beta, rho = f[0], f[1], f[2]
    rho_s = jnp.where(jnp.abs(rho) > 1e-12, rho, 1.0)
    bear = jnp.stack([alpha, beta, jnp.ones((), dtype)])
    r_wa = lie.quat_to_rot(q_a)
    j_pos = jnp.eye(3, dtype=dtype)
    j_att = -(1.0 / rho_s) * r_wa @ lie.skew(bear)
    mat = jnp.eye(3, dtype=dtype)
    mat = mat.at[0, 2].set(-alpha / rho_s)
    mat = mat.at[1, 2].set(-beta / rho_s)
    mat = mat.at[2, 2].set(-1.0 / rho_s)
    hf = (1.0 / rho_s) * r_wa @ mat
    return j_pos, j_att, hf


def _scatter_rows(d, m, anchor, feat_id, j_pos, j_att, hf, dtype):
    h = jnp.zeros((3, d), dtype)

    def put(h, blk, col):
        idx = (jnp.int32(0), jnp.asarray(col, jnp.int32))
        cur = jax.lax.dynamic_slice(h, idx, (3, 3))
        return jax.lax.dynamic_update_slice(h, cur + blk, idx)

    h = put(h, j_pos, 15 + 3 * anchor)
    h = put(h, j_att, 15 + 3 * m + 3 * anchor)
    h = put(h, hf, 15 + 6 * m + 3 * feat_id)
    return h


@highprec
def apply_matches_pairs(
    dims: StateDims,
    core,
    vision: VisionState,
    cov: jnp.ndarray,
    other_p_arr: jnp.ndarray,  # (K, M, 3) per-match peer windows
    other_q_arr: jnp.ndarray,  # (K, M, 4)
    other_f_arr: jnp.ndarray,  # (K, N, 3)
    other_anchor: jnp.ndarray,  # (K, N)
    other_lm_cov: jnp.ndarray,  # (K, N, N, 3, 3) joint peer landmark covs
    own_fid: jnp.ndarray,  # (K,) matched own feature slots
    other_fid: jnp.ndarray,  # (K,) matched peer feature slots
    match_valid: jnp.ndarray,  # (K,)
    sigma_landmark: float,
    ci_slam_w: float,
):
    """Sequentially apply K (masked) SLAM-SLAM CI updates where each
    match may reference a DIFFERENT peer snapshot (persistent match-store
    consumption, reference ``slam_matches_``). The peer side arrives
    pre-projected per landmark (compact wire protocol, payload.py) — the
    reference computes H' P' H'^T receiver-side from the full SimpleState
    covariance (multi_slam_update.cpp:134-245); the product is identical.

    Returns (core, vision, cov, n_applied, applied_mask).
    """
    m = dims.n_poses
    d = dims.d
    dtype = cov.dtype
    var_lm = sigma_landmark * sigma_landmark
    k = own_fid.shape[0]
    # negative ci_slam_w = downhill-only information flow with base weight
    # |w| — same semantics as the joint round form (apply_matches): fuse a
    # match ONLY when the peer's projected landmark covariance is more
    # confident than our own. Without this the stored-match upgrade path
    # let well-localized helpers fuse landmarks from a degraded peer
    # (observed: round-3 60s replay, helper ATE 207 m under collab).
    downhill_only = ci_slam_w < 0
    w_eff = abs(ci_slam_w)

    def body(carry, i):
        core, vision, cov, n_app = carry
        fid = own_fid[i]
        ofid = other_fid[i]

        o_p_arr = other_p_arr[i]
        o_q_arr = other_q_arr[i]
        lam = other_lm_cov[i, ofid, ofid]  # (3, 3) peer landmark covariance
        f = vision.f_arr[fid]
        a_idx = jnp.maximum(vision.anchor_idx[fid], 0)
        of = other_f_arr[i, ofid]
        oa_idx = jnp.maximum(other_anchor[i, ofid], 0)

        rho_s = jnp.where(jnp.abs(f[2]) > 1e-12, f[2], 1.0)
        orho_s = jnp.where(jnp.abs(of[2]) > 1e-12, of[2], 1.0)
        bear = jnp.stack([f[0], f[1], jnp.ones((), dtype)])
        obear = jnp.stack([of[0], of[1], jnp.ones((), dtype)])
        g_p_f = lie.quat_to_rot(vision.q_arr[a_idx]) @ bear / rho_s + vision.p_arr[a_idx]
        og_p_f = (
            lie.quat_to_rot(o_q_arr[oa_idx]) @ obear / orho_s + o_p_arr[oa_idx]
        )
        res = og_p_f - g_p_f  # multi_slam_update.cpp:130

        j_pos, j_att, hf = _landmark_jac_blocks(f, vision.q_arr[a_idx], dtype)
        h = _scatter_rows(d, m, a_idx, fid, j_pos, j_att, hf, dtype)

        # chi2(3, 0.90) gate on the joint innovation
        p_own = h @ cov @ h.T
        s_gate = p_own + lam + var_lm * jnp.eye(3, dtype=dtype)
        gamma = res @ linalg.solve3(s_gate, res)
        ok = (
            match_valid[i]
            & chi2_gate(gamma, jnp.asarray(3), 0.90, 4)
            & jnp.isfinite(res).all()
        )
        if downhill_only:
            ok = ok & (jnp.trace(lam) < jnp.trace(p_own))

        def do(args):
            core, vision, cov = args
            s, w_result = ci_mod.fuse_pairwise_proj(cov, h, lam, w_eff)
            s = s + var_lm * jnp.eye(3, dtype=dtype)
            # Inflate the own anchor + feature blocks (multi_slam_update.cpp:
            # 224-237). Unlike the reference (diagonal blocks only), scale
            # involved rows AND columns by sqrt(w_result): a congruence
            # transform D P D, so ci_P stays PSD and H ci_P H^T ==
            # w_result H P H^T == the own term of S exactly, which makes
            # (I-KH) ci_P provably PSD. The reference's diagonal-only
            # inflation leaves S ≺ H ci_P H^T by O(w) cross terms; applied
            # sequentially over many matches that compounds into an
            # indefinite covariance.
            scale = jnp.ones((d,), dtype)
            sq = jnp.sqrt(jnp.asarray(w_result, dtype))
            for col in (15 + 3 * a_idx, 15 + 3 * m + 3 * a_idx, 15 + 6 * m + 3 * fid):
                scale = jax.lax.dynamic_update_slice(
                    scale, jnp.full((3,), sq, dtype), (jnp.asarray(col, jnp.int32),)
                )
            ci_p = cov * scale[:, None] * scale[None, :]
            corr, cov1 = ci_mod.apply_ci(cov, ci_p, h, res, s)
            core1 = correct_core(core, corr)
            vision1 = correct_vision(vision, corr, dims)
            return core1, vision1, cov1

        core, vision, cov = jax.lax.cond(ok, do, lambda a: a, (core, vision, cov))
        return (core, vision, cov, n_app + ok.astype(jnp.int32)), ok

    (core, vision, cov, n_app), applied = jax.lax.scan(
        body, (core, vision, cov, jnp.asarray(0, jnp.int32)), jnp.arange(k)
    )
    return core, vision, cov, n_app, applied


def apply_matches(
    dims: StateDims,
    core,
    vision: VisionState,
    cov: jnp.ndarray,
    other_p_arr: jnp.ndarray,  # (M, 3) one shared peer snapshot
    other_q_arr: jnp.ndarray,
    other_f_arr: jnp.ndarray,
    other_anchor: jnp.ndarray,
    other_lm_cov: jnp.ndarray,  # (N, N, 3, 3)
    own_fid: jnp.ndarray,  # (K,)
    other_fid: jnp.ndarray,  # (K,)
    match_valid: jnp.ndarray,  # (K,)
    sigma_landmark: float,
    ci_slam_w: float,
):
    """Apply one round's K SLAM-SLAM matches against one shared peer
    snapshot as a SINGLE JOINT 3K-row CI update.

    Deliberate deviation from the reference, which applies one
    ``applyCI`` per match sequentially (``updater.cpp:144-161``): the K
    matches of a round are strongly correlated — the peer's landmark
    estimates share its pose errors, and so do the receiver's — and
    sequential fusion counts that common mode K times, collapsing the
    position sigma ~sqrt(K) below the true error (measured: one 8-match
    round took sigma 0.80 -> 0.047 m while 0.12 m of error remained).
    The joint form carries the full cross-match covariance on BOTH sides
    (own: H P H^T with cross terms; peer: the shipped joint landmark
    covariance blocks), so one round = one consistent CI fusion.

    Returns (core, vision, cov, n_applied, applied_mask).
    """
    m = dims.n_poses
    d = dims.d
    dtype = cov.dtype
    var_lm = sigma_landmark * sigma_landmark
    k = own_fid.shape[0]

    def one_match(fid, ofid):
        f = vision.f_arr[fid]
        a_idx = jnp.maximum(vision.anchor_idx[fid], 0)
        of = other_f_arr[ofid]
        oa_idx = jnp.maximum(other_anchor[ofid], 0)
        rho_s = jnp.where(jnp.abs(f[2]) > 1e-12, f[2], 1.0)
        orho_s = jnp.where(jnp.abs(of[2]) > 1e-12, of[2], 1.0)
        bear = jnp.stack([f[0], f[1], jnp.ones((), dtype)])
        obear = jnp.stack([of[0], of[1], jnp.ones((), dtype)])
        g_p_f = (
            lie.quat_to_rot(vision.q_arr[a_idx]) @ bear / rho_s
            + vision.p_arr[a_idx]
        )
        og_p_f = (
            lie.quat_to_rot(other_q_arr[oa_idx]) @ obear / orho_s
            + other_p_arr[oa_idx]
        )
        res = og_p_f - g_p_f
        j_pos, j_att, hf = _landmark_jac_blocks(f, vision.q_arr[a_idx], dtype)
        h = _scatter_rows(d, m, a_idx, fid, j_pos, j_att, hf, dtype)
        return res, h

    res_k, h_k = jax.vmap(one_match)(own_fid, other_fid)  # (K,3), (K,3,D)
    h = h_k.reshape(3 * k, d)
    res = res_k.reshape(3 * k)

    s_own = h @ cov @ h.T  # (3K, 3K) incl. cross-match terms
    lam = other_lm_cov[other_fid[:, None], other_fid[None, :]]  # (K,K,3,3)
    lam = lam.transpose(0, 2, 1, 3).reshape(3 * k, 3 * k)
    if ci_slam_w >= 0:
        w = jnp.asarray(ci_slam_w, dtype)
    else:
        # negative ci_slam_w = downhill-only information flow with base
        # weight |w| (the on-line-weighting role of the reference's NLopt
        # path, ci.cpp:66-76, realized as a gate): fuse a match ONLY when
        # the peer's landmark estimate is more confident than our own
        # (trace of the peer's 3x3 landmark covariance below the trace of
        # our projected block). A degraded agent receiving from a
        # confident peer fuses everything; a well-localized agent
        # receiving the degraded agent's map fuses nothing — without
        # this, symmetric fixed-weight fusion lets long-running fleets
        # drift into consensus with their worst member (observed in the
        # 4-agent thermal replay: helper ATE 0.08 -> 1.2 m).
        w = jnp.asarray(-ci_slam_w, dtype)
        d3 = jnp.arange(3)
        blk = 3 * jnp.arange(k)[:, None] + d3[None, :]
        own_tr = jnp.sum(jnp.diagonal(s_own)[blk], axis=1)  # (K,)
        peer_tr = jnp.sum(jnp.diagonal(lam)[blk], axis=1)
        match_valid = match_valid & (peer_tr < own_tr)
    s_full = s_own / (1.0 - w) + lam / w + var_lm * jnp.eye(3 * k, dtype=dtype)

    # per-match chi2(3, 0.90) gate on the match's own 3x3 innovation block
    def gate(i):
        s3 = jax.lax.dynamic_slice(s_full, (3 * i, 3 * i), (3, 3))
        r3 = jax.lax.dynamic_slice(res, (3 * i,), (3,))
        gamma = r3 @ linalg.solve3(s3, r3)
        return (
            match_valid[i]
            & chi2_gate(gamma, jnp.asarray(3), 0.90, 4)
            & jnp.isfinite(r3).all()
        )

    keep = jax.vmap(gate)(jnp.arange(k))  # (K,)
    keep3 = jnp.repeat(keep, 3)
    h = jnp.where(keep3[:, None], h, 0.0)
    res = jnp.where(keep3, res, 0.0)
    # dropped rows: identity diagonal keeps S invertible, zero rows of H
    # and res make them exact no-ops
    s_full = jnp.where(
        keep3[:, None] & keep3[None, :], s_full, 0.0
    ) + jnp.diag(jnp.where(keep3, 0.0, 1.0))

    n_app = jnp.sum(keep).astype(jnp.int32)

    def do(args):
        core, vision, cov = args
        w_result = 1.0 / (1.0 - w)
        # congruence-scale the involved own blocks (see apply_matches_pairs)
        scale = jnp.ones((d,), dtype)
        sq = jnp.sqrt(jnp.asarray(w_result, dtype))

        def add_scale(scale, i):
            fid = own_fid[i]
            a_idx = jnp.maximum(vision.anchor_idx[fid], 0)
            cols = (15 + 3 * a_idx, 15 + 3 * m + 3 * a_idx, 15 + 6 * m + 3 * fid)
            for col in cols:
                upd = jnp.where(keep[i], jnp.full((3,), sq, dtype), jax.lax.dynamic_slice(scale, (col,), (3,)))
                scale = jax.lax.dynamic_update_slice(scale, upd, (col,))
            return scale, None

        scale, _ = jax.lax.scan(add_scale, scale, jnp.arange(k))
        ci_p = cov * scale[:, None] * scale[None, :]
        corr, cov1 = ci_mod.apply_ci(cov, ci_p, h, res, s_full)
        core1 = correct_core(core, corr)
        vision1 = correct_vision(vision, corr, dims)
        return core1, vision1, cov1

    core, vision, cov = jax.lax.cond(
        n_app > 0, do, lambda a: a, (core, vision, cov)
    )
    return core, vision, cov, n_app, keep
