"""Time the sub-programs of the per-frame step on the TPU."""
import os, time

os.makedirs("/tmp/xmat_jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/xmat_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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

n_imu = 10
j = params.cfg.tracks.n_matches
rng = np.random.default_rng(0)
times = jnp.broadcast_to(jnp.arange(1, n_imu + 1) * 0.005, (A, n_imu)).astype(jnp.float32)
seqs = jnp.broadcast_to(jnp.arange(n_imu, dtype=jnp.int32), (A, n_imu))
w = jnp.zeros((A, n_imu, 3), jnp.float32)
a = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 9.81], jnp.float32), (A, n_imu, 3))
matches = tm.Matches.of(
    track_id=jnp.broadcast_to(jnp.arange(j, dtype=jnp.int32), (A, j)),
    prev_pt=jnp.asarray(rng.normal(size=(A, j, 2)) * 0.2, jnp.float32),
    cur_pt=jnp.asarray(rng.normal(size=(A, j, 2)) * 0.2, jnp.float32),
    valid=jnp.ones((A, j), bool),
)
meas = jax.vmap(lambda m: pipeline.FrameMeasurement.from_matches(params.cfg, m))(matches)


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1e3:8.3f} ms")
    return out


imu_batch = jax.jit(jax.vmap(lambda fs, t, s, w, a: ekf_mod.process_imu_batch_impl(params.ekf_params, fs, t, s, w, a)))
fs = timeit("imu_batch(10)", imu_batch, fs, times, seqs, w, a)

cov_at = jax.jit(jax.vmap(lambda fs: ekf_mod._cov_at(params.ekf_params, fs, fs.head)))
timeit("cov_at (lag=64)", cov_at, fs)

reprop = jax.jit(jax.vmap(lambda fs: ekf_mod._repropagate_tail(params.ekf_params, fs, fs.anchor_buf_idx)))
timeit("repropagate_tail", reprop, fs)

vis = jax.jit(
    jax.vmap(
        lambda fs, slots, meas: pipeline.visual_update(
            params.cfg, rb.get_slot(fs.buffer, fs.head), fs.vision, fs.cov, slots, meas
        )
    )
)
timeit("visual_update", vis, fs, slots, meas)

# track manager alone
tman = jax.jit(jax.vmap(lambda fs, slots, meas: tm.manage_tracks(
    params.cfg.tracks, slots, meas.matches, fs.vision.q_arr,
    fs.vision.q_arr[-1], params.cfg.min_track_length, 0.02, 0.02)))
timeit("manage_tracks", tman, fs, slots, meas)

full = jax.jit(jax.vmap(lambda fs, slots, t, s, w, a, mt, meas: (lambda fs2: ekf_mod.process_update_aux_impl(
    params.ekf_params, fs2, mt,
    lambda core, vision, cov, sl: pipeline.visual_update(params.cfg, core, vision, cov, sl, meas),
    slots))(ekf_mod.process_imu_batch_impl(params.ekf_params, fs, t, s, w, a))))
timeit("full step", full, fs, slots, times, seqs, w, a, times[:, -1], meas)
