"""Decompose the EKF update-wrapper cost (process_update_aux with identity
update): closest_idx, cov_at, repropagate, and the cond/select plumbing."""
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
from x_multi_agent_tpu.ekf import buffer as rb
from x_multi_agent_tpu.ekf import ekf as ekf_mod
from x_multi_agent_tpu.vio import vio as vio_mod

params = ge._params(small=False)
ekfp = params.ekf_params
n_agents = int(os.environ.get("BENCH_AGENTS", "128"))
n_iters = 30

fs0, slots0 = vio_mod.init_at_time(params, 0.0)
stack = lambda x: jnp.broadcast_to(x, (n_agents,) + x.shape)
fs = jax.tree.map(stack, fs0)

# run a couple of IMU batches so status=2 and the buffer has content
times = jnp.broadcast_to(jnp.arange(1, 11, dtype=jnp.float32) * 0.005, (n_agents, 10))
seqs = jnp.broadcast_to(jnp.arange(10, dtype=jnp.int32), (n_agents, 10))
w = jnp.zeros((n_agents, 10, 3), jnp.float32)
a = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 9.81], jnp.float32), (n_agents, 10, 3))
step_imu = jax.jit(jax.vmap(lambda f, t, s, ww, aa: ekf_mod.process_imu_batch_impl(ekfp, f, t, s, ww, aa)))
fs = step_imu(fs, times, seqs, w, a)
meas_t = times[:, -1]


def timeit(name, fn, *args):
    f = jax.jit(jax.vmap(fn))
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters
    print(f"{name:44s} {dt*1e3:8.2f} ms")
    return out


def ident(core, vision, cov, aux):
    return core, vision, cov, aux


timeit("full wrapper (identity update)",
       lambda f, t: ekf_mod.process_update_aux_impl(ekfp, f, t, ident, jnp.zeros(())), fs, meas_t)

timeit("closest_idx only",
       lambda f, t: rb.closest_idx(rb.times(f.buffer), t, ekfp.time_margin), fs, meas_t)


def cov_at_head(f, t):
    idx = rb.closest_idx(rb.times(f.buffer), t, ekfp.time_margin)
    return ekf_mod._cov_at(ekfp, f, jnp.maximum(idx, 0))


timeit("closest_idx + cov_at", cov_at_head, fs, meas_t)


def no_cond(f, t):
    """wrapper body without the outer lax.cond (always apply)."""
    import dataclasses
    idx = jnp.maximum(rb.closest_idx(rb.times(f.buffer), t, ekfp.time_margin), 0)
    cov_meas = ekf_mod._cov_at(ekfp, f, idx)
    core = rb.get_slot(f.buffer, idx)
    core1, vision1, cov1, _ = ident(core, f.vision, cov_meas, 0.0)
    buf = rb.set_slot(f.buffer, idx, core1)
    f = dataclasses.replace(f, buffer=buf, cov=cov1, vision=vision1, anchor_buf_idx=idx)
    return ekf_mod._repropagate_tail(ekfp, f, idx)


timeit("wrapper body, no cond", no_cond, fs, meas_t)
