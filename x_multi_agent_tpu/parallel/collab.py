"""Collaborative (multi-agent) fusion rounds.

The reference's decentralized exchange (SURVEY §2.9.5): each agent ships a
SimpleState payload to peers (full-map broadcast mode, ``getDataToSend``)
and fuses received states via SLAM-SLAM covariance intersection
(``VIO::processOtherMeasurements`` -> ``Ekf::processOthersMeasurement`` ->
``Updater::collaborativeUpdate``).

TPU form: payloads of all agents are one stacked pytree. On one chip the
round is a vmap over agents; over a mesh the payload stack is an
all_gather over the ``agents`` axis and the per-agent fusion stays local.
GT_DEBUG landmark matching stands in for descriptor place recognition
(config 4 of BASELINE.json); the descriptor path plugs into the same match
interface.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ekf import ekf as ekf_mod
from ..parallel.payload import AgentPayload, make_payload, slam_landmarks_world
from ..place_recognition.gt_matching import match_landmarks
from ..vio.updates import multi_slam
from ..vio import vio as vio_mod


class CollabConfig(NamedTuple):
    sigma_landmark: float = 0.1
    ci_slam_w: float = 0.01  # weight given to the peer (reference ci_slam_w)
    gt_match_dist: float = 0.5  # GT_DEBUG proximity gate [m]
    match_budget: int = 10  # SLAM-SLAM matches per peer


def extract_payload(params: vio_mod.VioParams, fs) -> AgentPayload:
    """Snapshot the anchor-state vision/covariance for broadcast."""
    t = fs.buffer.time[fs.anchor_buf_idx]
    return make_payload(params.cfg.dims, t, fs.vision, fs.cov)


def fuse_with_peer(
    params: vio_mod.VioParams,
    ccfg: CollabConfig,
    fs,
    peer: AgentPayload,
    peer_valid,
):
    """Reference ``processOtherMeasurements`` (SLAM-SLAM path): match peer
    landmarks, CI-fuse at the closest buffer state, repropagate."""
    dims = params.cfg.dims

    def update_fn(core, vision, cov, aux):
        own_lm, own_valid = slam_landmarks_world(dims, vision)
        own_idx, other_idx, mvalid = match_landmarks(
            own_lm,
            own_valid,
            peer.landmarks,
            peer.landmark_valid,
            ccfg.gt_match_dist,
            ccfg.match_budget,
        )
        mvalid = mvalid & peer_valid
        core, vision, cov, n_app = multi_slam.apply_matches(
            dims, core, vision, cov,
            peer.p_arr, peer.q_arr, peer.f_arr, peer.anchor_idx, peer.cov,
            own_idx, other_idx, mvalid,
            ccfg.sigma_landmark, ccfg.ci_slam_w,
        )
        return core, vision, cov, aux + n_app

    fs, n_applied, ok = ekf_mod.process_update_aux_impl(
        params.ekf_params, fs, peer.time, update_fn, jnp.asarray(0, jnp.int32)
    )
    return fs, n_applied


def collaborative_round(params: vio_mod.VioParams, ccfg: CollabConfig, fs_stack):
    """One full-map exchange round for A stacked agents (single host/chip
    form: vmap over agents; all payloads visible in the stacked pytree).

    Returns (fs_stack, n_matches (A, A))."""
    payloads = jax.vmap(lambda fs: extract_payload(params, fs))(fs_stack)
    a = payloads.time.shape[0]

    def one_agent(fs, my_id):
        def peer_step(carry, b):
            fs = carry
            peer = jax.tree.map(lambda x: x[b], payloads)
            fs, n = fuse_with_peer(params, ccfg, fs, peer, b != my_id)
            return fs, n

        fs, ns = jax.lax.scan(peer_step, fs, jnp.arange(a))
        return fs, ns

    return jax.vmap(one_agent)(fs_stack, jnp.arange(a))


collaborative_round_jit = jax.jit(collaborative_round, static_argnums=(0, 1))
