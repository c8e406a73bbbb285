"""Trajectory evaluation: ATE and filter-consistency (NEES) metrics.

The reference ecosystem validates end-to-end on datasets (SURVEY §4);
these are the metrics used for those comparisons plus the NEES/NIS
consistency bounds the new framework adds.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def align_umeyama(est: np.ndarray, gt: np.ndarray, with_scale: bool = False):
    """SE(3) (optionally Sim(3)) alignment of est -> gt (Umeyama)."""
    mu_e = est.mean(0)
    mu_g = gt.mean(0)
    e = est - mu_e
    g = gt - mu_g
    cov = g.T @ e / len(est)
    u, d, vt = np.linalg.svd(cov)
    s = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s[2, 2] = -1
    r = u @ s @ vt
    if with_scale:
        var_e = (e**2).sum() / len(est)
        c = np.trace(np.diag(d) @ s) / var_e
    else:
        c = 1.0
    t = mu_g - c * r @ mu_e
    return c, r, t


def ate_rmse(est: np.ndarray, gt: np.ndarray, align: bool = False) -> float:
    """Absolute trajectory error RMSE [m]. ``align=True`` removes the
    gauge (SE3 alignment) first, like standard ATE evaluation."""
    if align:
        c, r, t = align_umeyama(est, gt)
        est = (c * (r @ est.T)).T + t
    return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1))))


def nees(
    est_p: np.ndarray,  # (T, 3) estimated positions
    gt_p: np.ndarray,  # (T, 3)
    cov_pp: np.ndarray,  # (T, 3, 3) position covariance blocks
) -> np.ndarray:
    """Per-step normalized estimation error squared (position block).
    A consistent filter averages ~3 (the state dimension)."""
    err = est_p - gt_p
    out = np.empty(len(err))
    for i, (e, p) in enumerate(zip(err, cov_pp)):
        out[i] = e @ np.linalg.solve(p, e)
    return out
