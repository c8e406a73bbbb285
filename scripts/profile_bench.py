"""Timing decomposition of the bench step: which sub-program dominates?

Measures, at BENCH_AGENTS agents, the per-frame wall time of
  1. IMU batch propagation alone
  2. EKF update machinery with identity update_fn (cov_at + repropagate)
  3. the full visual update
  4. visual_update called directly at a fixed state (no EKF wrapping)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xmat_jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/xmat_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import __graft_entry__ as ge
from x_multi_agent_tpu.ekf import ekf as ekf_mod
from x_multi_agent_tpu.vio import pipeline, track_manager as tm, vio as vio_mod

params = ge._params(small=False)
n_agents = int(os.environ.get("BENCH_AGENTS", "32"))
n_iters = 20
n_imu = 10

fs0, slots0 = vio_mod.init_at_time(params, 0.0)
stack = lambda x: jnp.broadcast_to(x, (n_agents,) + x.shape)
fs0 = jax.tree.map(stack, fs0)
slots0 = jax.tree.map(stack, slots0)

j = params.cfg.tracks.n_matches
rng = np.random.default_rng(0)


def frame_inputs(k):
    t0 = k * n_imu * 0.005
    times = jnp.asarray(
        np.broadcast_to(t0 + np.arange(1, n_imu + 1) * 0.005, (n_agents, n_imu)),
        jnp.float32,
    )
    seqs = jnp.broadcast_to(jnp.arange(n_imu, dtype=jnp.int32) + k * n_imu, (n_agents, n_imu))
    w = jnp.zeros((n_agents, n_imu, 3), jnp.float32)
    a = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 9.81], jnp.float32), (n_agents, n_imu, 3))
    matches = tm.Matches.of(
        track_id=jnp.broadcast_to(jnp.arange(j, dtype=jnp.int32), (n_agents, j)),
        prev_pt=jnp.asarray(rng.normal(size=(n_agents, j, 2)) * 0.2, jnp.float32),
        cur_pt=jnp.asarray(rng.normal(size=(n_agents, j, 2)) * 0.2, jnp.float32),
        valid=jnp.ones((n_agents, j), bool),
    )
    meas = jax.vmap(lambda m: pipeline.FrameMeasurement.from_matches(params.cfg, m))(matches)
    return times, seqs, w, a, times[:, -1], meas


inputs = [jax.tree.map(jnp.asarray, frame_inputs(k)) for k in range(n_iters + 1)]


def timeit(name, fn, state):
    state = fn(state, inputs[0])
    jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.perf_counter()
    for k in range(1, n_iters + 1):
        state = fn(state, inputs[k])
    jax.block_until_ready(jax.tree.leaves(state)[0])
    dt = (time.perf_counter() - t0) / n_iters
    print(f"{name:30s} {dt*1e3:8.2f} ms/frame  ({n_agents*(1/dt):8.0f} agent-frames/s)")
    return state


# 1. IMU only
@jax.jit
@jax.vmap
def imu_only(fs, slots, times, seqs, w, a, mt, meas):
    fs = ekf_mod.process_imu_batch_impl(params.ekf_params, fs, times, seqs, w, a)
    return fs, slots


timeit("imu_batch only", lambda s, i: imu_only(*s, *i), (fs0, slots0))


# 2. EKF wrap with identity update
@jax.jit
@jax.vmap
def ekf_identity(fs, slots, times, seqs, w, a, mt, meas):
    fs = ekf_mod.process_imu_batch_impl(params.ekf_params, fs, times, seqs, w, a)

    def upd(core, vision, cov, slots):
        return core, vision, cov, slots

    fs, slots, _ = ekf_mod.process_update_aux_impl(params.ekf_params, fs, mt, upd, slots)
    return fs, slots


timeit("imu + ekf(identity update)", lambda s, i: ekf_identity(*s, *i), (fs0, slots0))


# 3. full step
@jax.jit
@jax.vmap
def full(fs, slots, times, seqs, w, a, mt, meas):
    fs = ekf_mod.process_imu_batch_impl(params.ekf_params, fs, times, seqs, w, a)

    def upd(core, vision, cov, slots):
        return pipeline.visual_update(params.cfg, core, vision, cov, slots, meas)

    fs, slots, _ = ekf_mod.process_update_aux_impl(params.ekf_params, fs, mt, upd, slots)
    return fs, slots


timeit("full step", lambda s, i: full(*s, *i), (fs0, slots0))


# 4. visual_update alone at a fixed state
core0 = jax.vmap(lambda f: ekf_mod.tail_core(f))(fs0)


@jax.jit
def vu_only(carry, meas):
    vision, cov, slots = carry

    def one(core, vision, cov, slots, meas):
        return pipeline.visual_update(params.cfg, core, vision, cov, slots, meas)

    core, vision, cov, slots = jax.vmap(one)(core0, vision, cov, slots, meas)
    return (vision, cov, slots)


timeit(
    "visual_update only",
    lambda s, i: vu_only(s, i[-1]),
    (fs0.vision, fs0.cov, slots0),
)
