"""Covariance intersection (Julier-Uhlmann).

Behavioral spec: reference ``src/x/ekf/ci.cpp``. Two variants:
  * pairwise SLAM fusion (``ci.cpp:94-127``):
      S = 1/(1-w) H_a P_a H_a^T + 1/w H_b P_b H_b^T
    with w = ci_slam_w fixed, w_result = 1/(1-w)
  * N-way MSCKF fusion (``ci.cpp:49-92``): S = sum_i (1/w_i) H_i P_i H_i^T

The reference optionally optimizes w online with NLopt COBYLA minimizing
det((sum w_i M_i)^-1) within a 0.1 s budget (``ci.cpp:143-190``), falling
back to fixed weights on failure. Here: fixed weights (the paper's default
deployment path) plus a deterministic fixed-iteration golden-section search
for the pairwise case (negative w requests optimization, like the
reference's convention).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.linalg import highprec


@highprec
def fuse_pairwise(
    cov_a: jnp.ndarray,
    h_a: jnp.ndarray,
    cov_b: jnp.ndarray,
    h_b: jnp.ndarray,
    w_other: float,
    n_opt_iters: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (S, w_result). ``w_other`` < 0 requests on-line weight search
    (reference NLopt path) — replaced by a fixed-iteration golden-section
    minimization of det(S(w)) over w in [1e-4, 1-1e-4]."""
    p_b = h_b @ cov_b @ h_b.T
    return fuse_pairwise_proj(cov_a, h_a, p_b, w_other, n_opt_iters)


@highprec
def fuse_pairwise_proj(
    cov_a: jnp.ndarray,
    h_a: jnp.ndarray,
    p_b: jnp.ndarray,
    w_other: float,
    n_opt_iters: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`fuse_pairwise` with the peer term already PROJECTED:
    ``p_b = H_b P_b H_b^T``. This is the compact-protocol form — the peer
    ships per-landmark 3x3 projected covariances instead of its full
    (D, D) covariance (SimpleState wire-size cut; see payload.py)."""
    p_a = h_a @ cov_a @ h_a.T

    if w_other >= 0:
        w = jnp.asarray(w_other, cov_a.dtype)
    else:
        # minimize logdet( 1/(1-w) P_a + 1/w P_b ) over w
        def obj(w):
            s = p_a / (1.0 - w) + p_b / w
            sign, logdet = jnp.linalg.slogdet(s)
            return logdet

        lo = jnp.asarray(1e-4, cov_a.dtype)
        hi = jnp.asarray(1.0 - 1e-4, cov_a.dtype)
        gr = 0.6180339887498949

        def body(_, carry):
            lo, hi = carry
            x1 = hi - gr * (hi - lo)
            x2 = lo + gr * (hi - lo)
            f1, f2 = obj(x1), obj(x2)
            lo = jnp.where(f1 > f2, x1, lo)
            hi = jnp.where(f1 > f2, hi, x2)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, n_opt_iters, body, (lo, hi))
        w = 0.5 * (lo + hi)

    s = p_a / (1.0 - w) + p_b / w
    w_result = 1.0 / (1.0 - w)
    return s, w_result


def optimize_weights_nway(
    m_own: jnp.ndarray,  # (r, r) own information-like H P^-1 H^T
    m_others: jnp.ndarray,  # (K, r, r)
    valid_other: jnp.ndarray,  # (K,)
    w_fallback: float,
    n_iters: int = 30,
) -> jnp.ndarray:
    """On-device replacement for the reference's NLopt COBYLA weight solve
    (``CovarianceIntersection::solveW``, ``ci.cpp:143-190``): minimize
    det((sum w_i M_i)^-1) — i.e. maximize logdet(sum w_i M_i) — over the
    simplex sum w = 1, bounds [1e-4, 1].

    Solver: the multiplicative fixed-point iteration
        w_i <- w_i * tr(S^-1 M_i) / r,   S = sum w_j M_j
    whose update *exactly* preserves sum w = 1 (sum_i w_i tr(S^-1 M_i) =
    tr(S^-1 S) = r) and whose fixed points are the KKT points of the
    problem (at optimality tr(S^-1 M_i) is equal for all active i).
    Deterministic, fixed iteration count, jit/vmap friendly. Falls back to
    the reference's fixed weights (w_0 = 1 - K*w, w_i = w) when the
    iteration produces non-finite values (reference: NLopt failure ->
    fixed weights, ci.cpp:70-73).

    Returns w of shape (K+1,): [w_own, w_peer_0, ...]; invalid peers get 0.
    """
    dtype = m_own.dtype
    k = m_others.shape[0]
    r = m_own.shape[0]
    # tiny ridge: padded/masked Jacobian rows make M rank-deficient
    ridge = 1e-8 * jnp.eye(r, dtype=dtype)
    m_stack = jnp.concatenate([m_own[None] + ridge, m_others + ridge], axis=0)
    valid = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.asarray(valid_other, bool)]
    )
    m_stack = jnp.where(valid[:, None, None], m_stack, 0.0)
    nv = jnp.sum(valid).astype(dtype)
    w0 = jnp.where(valid, 1.0 / nv, 0.0).astype(dtype)

    def body(_, w):
        s = jnp.einsum("k,kij->ij", w, m_stack)
        sinv = jnp.linalg.inv(s)
        tr = jnp.einsum("ij,kji->k", sinv, m_stack)
        w = w * tr / r
        # project to the box [1e-4, 1] and renormalize over valid entries
        w = jnp.where(valid, jnp.clip(w, 1e-4, 1.0), 0.0)
        return w / jnp.sum(w)

    w = jax.lax.fori_loop(0, n_iters, body, w0)

    # fallback: the reference's fixed weights on failure
    k_eff = jnp.sum(jnp.asarray(valid_other, bool)).astype(dtype)
    w_fixed = jnp.where(valid, w_fallback, 0.0).astype(dtype)
    w_fixed = w_fixed.at[0].set(1.0 - k_eff * w_fallback)
    ok = jnp.all(jnp.isfinite(w)) & (w[0] > 0)
    return jnp.where(ok, w, w_fixed)


@highprec
def fuse_nway(
    cov_own: jnp.ndarray,
    h_own: jnp.ndarray,
    covs_other: jnp.ndarray,  # (K, Do, Do)
    hs_other: jnp.ndarray,  # (K, r, Do)
    valid_other: jnp.ndarray,  # (K,)
    w_other: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """N-way CI for the multi-MSCKF path (``ci.cpp:49-92``): fixed weights
    w_0 = 1 - K*w_other for self, w_other each peer. Returns (S, w_result =
    1/w_0)."""
    k_eff = jnp.sum(valid_other)
    w0 = 1.0 - k_eff * w_other
    s = (1.0 / w0) * h_own @ cov_own @ h_own.T

    def per_peer(cov_b, h_b, v):
        return jnp.where(v, (1.0 / w_other) * h_b @ cov_b @ h_b.T, 0.0)

    s = s + jax.vmap(per_peer)(covs_other, hs_other, valid_other).sum(axis=0)
    return s, 1.0 / w0


@highprec
def apply_ci(
    cov: jnp.ndarray,
    ci_cov: jnp.ndarray,
    h: jnp.ndarray,
    res: jnp.ndarray,
    s: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CI Kalman application (reference ``Updater::applyCI``,
    ``updater.cpp:144-161``): K = ci_P H^T S^-1, P <- sym((I-KH) ci_P).
    Returns (correction, new_cov)."""
    d = cov.shape[0]
    # LU, not Cholesky: the CI-weighted S is not guaranteed PSD wrt ci_P
    # (the reference uses a plain inverse too, updater.cpp:152)
    k = jnp.linalg.solve(s, h @ ci_cov).T  # ci_P H^T S^-1
    correction = k @ res
    new_cov = 0.5 * ((jnp.eye(d, dtype=cov.dtype) - k @ h) @ ci_cov)
    new_cov = new_cov + new_cov.T
    return correction, new_cov
