"""Trajectory-level collaborative-gain evaluation.

The reference's headline result is "up to 46% trajectory-estimate
improvement" of collaborative over single-agent VIO (README.md:97-98,
RAL'22 abstract). The released datasets are not available offline, so
this reproduces the experiment's *shape* on the synthetic harness
(SURVEY §4: GT_DEBUG-style deterministic fusion): N agents fly the same
scene; one agent is degraded (initial offset under a loose prior — the
gauge-unobservable error that single-agent VIO can never recover);
periodic full-map exchange rounds (``VIO::getDataToSend`` →
``processOtherMeasurements`` equivalents) let the collaborative variant
correct it. The metric is full-trajectory ATE RMSE of the degraded
agent, solo vs collaborative.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..parallel import collab
from ..vio import track_manager as tm
from ..vio import vio as vio_mod
from .evaluation import ate_rmse
from .sim import make_circle_sim


class CollabGainResult(NamedTuple):
    ate_solo: float  # degraded agent, no exchange [m]
    ate_collab: float  # degraded agent, periodic exchange rounds [m]
    ate_helper: float  # well-initialized agent in the collab run [m]
    gain: float  # 1 - ate_collab / ate_solo
    n_rounds: int
    n_matches: int  # cross-agent landmark matches applied in total
    mean_nees_collab: float = float("nan")  # degraded agent, collab pass


def _new_agent(params: vio_mod.VioParams, offset, sigma_dp):
    p = params._replace(sigma_dp=(sigma_dp,) * 3)
    v = vio_mod.VIO(p)
    v.init_at_time(0.0, p=np.asarray(offset, float), v=np.array([1.8, 0.0, 0.0]))
    return v


def run_collab_gain(
    params: vio_mod.VioParams,
    ccfg: collab.CollabConfig,
    duration: float = 3.0,
    offset: float = 0.4,
    exchange_every: int = 5,
    pixel_noise: float = 5e-4,
    seed: int = 1,
) -> CollabGainResult:
    """Two agents over the same landmark field; agent B starts ``offset``
    metres off with a prior that knows it. Returns solo-vs-collab ATE of
    agent B over the whole trajectory."""
    sim = make_circle_sim(
        duration=duration, imu_rate=100.0, cam_rate=10.0, n_landmarks=30,
        match_budget=params.cfg.tracks.n_matches, pixel_noise=pixel_noise,
        seed=seed,
    )

    def drive(collaborate: bool):
        va = _new_agent(params, (0.0, 0.0, 0.0), 1e-3)
        vb = _new_agent(params, (offset, 0.0, 0.0), max(0.5, 2 * offset))
        est_b, est_a, anchor_b, cov_b = [], [], [], []
        imu_i = 0
        n_rounds = 0
        n_matches = 0
        for f, t_cam in enumerate(sim.cam_t):
            while imu_i < len(sim.imu_t) and sim.imu_t[imu_i] <= t_cam + 1e-9:
                for v in (va, vb):
                    v.process_imu(
                        sim.imu_t[imu_i], imu_i, sim.imu_w[imu_i], sim.imu_a[imu_i]
                    )
                imu_i += 1
            matches = tm.Matches.of(
                track_id=jnp.asarray(sim.match_id[f]),
                prev_pt=jnp.asarray(sim.match_prev[f]),
                cur_pt=jnp.asarray(sim.match_cur[f]),
                valid=jnp.asarray(sim.match_valid[f]),
            )
            for v in (va, vb):
                v.process_matches_measurement(t_cam, f, matches)
            if collaborate and (f + 1) % exchange_every == 0:
                fs_stack = jax.tree.map(lambda x, y: jnp.stack([x, y]), va.fs, vb.fs)
                fs_stack, nm = collab.collaborative_round_jit(params, ccfg, fs_stack)
                va.fs = jax.tree.map(lambda x: x[0], fs_stack)
                vb.fs = jax.tree.map(lambda x: x[1], fs_stack)
                n_rounds += 1
                n_matches += int(np.asarray(nm).sum())
            est_a.append(np.asarray(va.tail_state().p))
            est_b.append(np.asarray(vb.tail_state().p))
            anchor_b.append(np.asarray(vb.anchor_state().p))
            cov_b.append(np.asarray(vb.fs.cov[:3, :3]))
        return (np.array(est_a), np.array(est_b), n_rounds, n_matches,
                np.array(anchor_b), np.array(cov_b))

    gt = sim.cam_p
    _, solo_b, _, _, _, _ = drive(collaborate=False)
    (collab_a, collab_b, n_rounds, n_matches, anchor_b, cov_b) = drive(
        collaborate=True
    )

    # collaborative-path NEES of the degraded agent (3-dof position,
    # anchor state vs gt at frame times; warmup skipped)
    from .evaluation import nees as nees_fn

    mean_nees = float(np.mean(nees_fn(anchor_b[5:], gt[5:], cov_b[5:])))

    ate_solo = ate_rmse(solo_b, gt)
    ate_collab = ate_rmse(collab_b, gt)
    return CollabGainResult(
        ate_solo=float(ate_solo),
        ate_collab=float(ate_collab),
        ate_helper=float(ate_rmse(collab_a, gt)),
        gain=float(1.0 - ate_collab / ate_solo),
        n_rounds=n_rounds,
        n_matches=n_matches,
        mean_nees_collab=mean_nees,
    )
