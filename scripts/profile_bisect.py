"""Bisect the 100 ms full-step mystery."""
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
from x_multi_agent_tpu.vio import pipeline, vio as vio_mod
from x_multi_agent_tpu.vio import track_manager as tm
import __graft_entry__ as ge

A = int(os.environ.get("A", "32"))
params = ge._params(small=False)

fs, slots = vio_mod.init_at_time(params, 0.0)
stack = lambda x: jnp.broadcast_to(x, (A,) + x.shape)
fs = jax.tree.map(stack, fs)
slots = jax.tree.map(stack, slots)

j = params.cfg.tracks.n_matches
rng = np.random.default_rng(0)
matches = tm.Matches.of(
    track_id=jnp.broadcast_to(jnp.arange(j, dtype=jnp.int32), (A, j)),
    prev_pt=jnp.asarray(rng.normal(size=(A, j, 2)) * 0.2, jnp.float32),
    cur_pt=jnp.asarray(rng.normal(size=(A, j, 2)) * 0.2, jnp.float32),
    valid=jnp.ones((A, j), bool),
)
meas = jax.vmap(lambda m: pipeline.FrameMeasurement.from_matches(params.cfg, m))(matches)
mt = jnp.zeros((A,), jnp.float32)


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


def vupd(core, vision, cov, sl, m):
    return pipeline.visual_update(params.cfg, core, vision, cov, sl, m)


# 1: identity update through process_update_aux (cond + cov_at + reprop)
def step_identity(fs, slots, mt, meas):
    return ekf_mod.process_update_aux_impl(
        params.ekf_params, fs, mt, lambda c, v, p, s: (c, v, p, s), slots
    )

timeit("update_aux(identity)", jax.jit(jax.vmap(step_identity)), fs, slots, mt, meas)


# 2: full visual update through process_update_aux
def step_full(fs, slots, mt, meas):
    return ekf_mod.process_update_aux_impl(
        params.ekf_params, fs, mt,
        lambda c, v, p, s: vupd(c, v, p, s, meas), slots,
    )

timeit("update_aux(visual)", jax.jit(jax.vmap(step_full)), fs, slots, mt, meas)


# 3: do_update path without cond: inline cov_at + visual + write + reprop
def step_nocond(fs, slots, mt, meas):
    idx = fs.head
    cov_meas = ekf_mod._cov_at(params.ekf_params, fs, idx)
    core = rb.get_slot(fs.buffer, idx)
    c1, v1, p1, s1 = vupd(core, fs.vision, cov_meas, slots, meas)
    buf = rb.set_slot(fs.buffer, idx, c1)
    fs = dataclasses.replace(fs, buffer=buf, cov=p1, vision=v1, anchor_buf_idx=idx)
    return ekf_mod._repropagate_tail(params.ekf_params, fs, idx), s1

timeit("nocond(cov_at+visual+reprop)", jax.jit(jax.vmap(step_nocond)), fs, slots, mt, meas)
