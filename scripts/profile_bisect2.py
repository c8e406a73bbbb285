"""Bisect inside process_update_aux (identity update)."""
import os, time

os.makedirs("/tmp/xmat_jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/xmat_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses
import jax.numpy as jnp
import numpy as np
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x_multi_agent_tpu.ekf import buffer as rb
from x_multi_agent_tpu.ekf import ekf as ekf_mod
from x_multi_agent_tpu.ekf.propagator import compound_transitions, propagate_covariance, propagate_mean, step_transition
from x_multi_agent_tpu.vio import vio as vio_mod
import __graft_entry__ as ge

A = int(os.environ.get("A", "32"))
params = ge._params(small=False)
ep = params.ekf_params

fs, slots = vio_mod.init_at_time(params, 0.0)
stack = lambda x: jnp.broadcast_to(x, (A,) + x.shape)
fs = jax.tree.map(stack, fs)


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:8.3f} ms", flush=True)
    return out


def a_(fs):  # closest_idx + cov_at only
    idx = rb.closest_idx(fs.buffer.time, jnp.float32(0.0), ep.time_margin)
    idx = jnp.maximum(idx, 0)
    return ekf_mod._cov_at(ep, fs, idx)

timeit("a: closest+cov_at", jax.jit(jax.vmap(a_)), fs)


def b_(fs):  # + set_slot write
    idx = jnp.maximum(rb.closest_idx(fs.buffer.time, jnp.float32(0.0), ep.time_margin), 0)
    cov = ekf_mod._cov_at(ep, fs, idx)
    core = rb.get_slot(fs.buffer, idx)
    buf = rb.set_slot(fs.buffer, idx, core)
    return dataclasses.replace(fs, buffer=buf, cov=cov, anchor_buf_idx=idx)

timeit("b: a + set_slot", jax.jit(jax.vmap(b_)), fs)


def c_(fs):  # + reprop scan without final scatter
    fs = b_(fs)
    idx = fs.anchor_buf_idx
    lag = ep.max_update_lag
    bsz = ep.dims.buffer_size
    n_steps = rb.steps_between(idx, fs.head, bsz)
    idxs = rb.ring_range(idx, lag, bsz)
    samples = rb.get_slot(fs.buffer, idxs)
    step_mask = jnp.arange(lag) < n_steps
    g = ep.g_vec.astype(fs.cov.dtype)

    def body(carry, inp):
        sample, valid = inp
        t1 = jnp.where(valid, sample.time, carry.time)
        new = propagate_mean(carry, t1, sample.seq, sample.w_m, sample.a_m, g)
        return new, new

    start = rb.get_slot(fs.buffer, idx)
    _, outs = jax.lax.scan(body, start, (samples, step_mask))
    return fs, outs

timeit("c: b + reprop scan (no scatter)", jax.jit(jax.vmap(c_)), fs)


def d_(fs):  # full identity update path
    return ekf_mod.process_update_aux_impl(ep, fs, jnp.float32(0.0), lambda c, v, p, s: (c, v, p, s), 0)

timeit("d: full update_aux(identity)", jax.jit(jax.vmap(lambda fs: d_(fs))), fs)
