"""Quick perf experiments on the bench step: donation + agent-count sweep."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/xmat_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import __graft_entry__ as ge
from x_multi_agent_tpu.ekf import ekf as ekf_mod
from x_multi_agent_tpu.vio import pipeline, track_manager as tm, vio as vio_mod

params = ge._params(small=False)
n_imu = 10
n_iters = 20
j = params.cfg.tracks.n_matches
rng = np.random.default_rng(0)


def one_agent(fs, slots, times, seqs, w, a, meas_time, meas):
    fs = ekf_mod.process_imu_batch_impl(params.ekf_params, fs, times, seqs, w, a)

    def update_fn(core, vision, cov, slots):
        return pipeline.visual_update(params.cfg, core, vision, cov, slots, meas)

    fs, slots, applied = ekf_mod.process_update_aux_impl(
        params.ekf_params, fs, meas_time, update_fn, slots
    )
    return fs, slots, applied


def run(n_agents, donate):
    fs, slots = vio_mod.init_at_time(params, 0.0)
    stack = lambda x: jnp.broadcast_to(x, (n_agents,) + x.shape)
    fs = jax.tree.map(stack, fs)
    slots = jax.tree.map(stack, slots)
    if donate:
        step = jax.jit(jax.vmap(one_agent), donate_argnums=(0, 1))
    else:
        step = jax.jit(jax.vmap(one_agent))

    def frame_inputs(k):
        t0 = k * n_imu * 0.005
        times = jnp.asarray(
            np.broadcast_to(t0 + np.arange(1, n_imu + 1) * 0.005, (n_agents, n_imu)),
            jnp.float32,
        )
        seqs = jnp.broadcast_to(
            jnp.arange(n_imu, dtype=jnp.int32) + k * n_imu, (n_agents, n_imu)
        )
        w = jnp.zeros((n_agents, n_imu, 3), jnp.float32)
        a = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 9.81], jnp.float32), (n_agents, n_imu, 3)
        )
        matches = tm.Matches.of(
            track_id=jnp.broadcast_to(jnp.arange(j, dtype=jnp.int32), (n_agents, j)),
            prev_pt=jnp.asarray(rng.normal(size=(n_agents, j, 2)) * 0.2, jnp.float32),
            cur_pt=jnp.asarray(rng.normal(size=(n_agents, j, 2)) * 0.2, jnp.float32),
            valid=jnp.ones((n_agents, j), bool),
        )
        meas = jax.vmap(
            lambda m: pipeline.FrameMeasurement.from_matches(params.cfg, m)
        )(matches)
        return times, seqs, w, a, times[:, -1], meas

    inputs = [jax.tree.map(jnp.asarray, frame_inputs(k)) for k in range(n_iters + 1)]
    fs, slots, _ = step(fs, slots, *inputs[0])
    jax.block_until_ready(fs.cov)
    t0 = time.perf_counter()
    for k in range(1, n_iters + 1):
        fs, slots, _ = step(fs, slots, *inputs[k])
    jax.block_until_ready(fs.cov)
    dt = time.perf_counter() - t0
    ups = n_agents * n_iters / dt
    print(f"agents={n_agents:4d} donate={donate}  {ups:8.1f} updates/s "
          f"({dt/n_iters*1e3:6.1f} ms/frame)", flush=True)
    return ups


configs = sys.argv[1:] or ["128:1"]
for c in configs:
    n, d = c.split(":")
    run(int(n), bool(int(d)))
