"""Capture a perfetto trace of the full bench step and aggregate op times."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

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
n_agents = 32
n_imu = 10

fs, slots = vio_mod.init_at_time(params, 0.0)
stack = lambda x: jnp.broadcast_to(x, (n_agents,) + x.shape)
fs = jax.tree.map(stack, fs)
slots = jax.tree.map(stack, slots)

j = params.cfg.tracks.n_matches
rng = np.random.default_rng(0)
times = jnp.asarray(np.broadcast_to(np.arange(1, n_imu + 1) * 0.005, (n_agents, n_imu)), jnp.float32)
seqs = jnp.broadcast_to(jnp.arange(n_imu, dtype=jnp.int32), (n_agents, n_imu))
w = jnp.zeros((n_agents, n_imu, 3), jnp.float32)
a = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 9.81], jnp.float32), (n_agents, n_imu, 3))
matches = tm.Matches.of(
    track_id=jnp.broadcast_to(jnp.arange(j, dtype=jnp.int32), (n_agents, j)),
    prev_pt=jnp.asarray(rng.normal(size=(n_agents, j, 2)) * 0.2, jnp.float32),
    cur_pt=jnp.asarray(rng.normal(size=(n_agents, j, 2)) * 0.2, jnp.float32),
    valid=jnp.ones((n_agents, j), bool),
)
meas = jax.vmap(lambda m: pipeline.FrameMeasurement.from_matches(params.cfg, m))(matches)


@jax.jit
@jax.vmap
def step(fs, slots, times, seqs, w, a, mt, meas):
    fs = ekf_mod.process_imu_batch_impl(params.ekf_params, fs, times, seqs, w, a)

    def upd(core, vision, cov, slots):
        return pipeline.visual_update(params.cfg, core, vision, cov, slots, meas)

    fs, slots, _ = ekf_mod.process_update_aux_impl(params.ekf_params, fs, mt, upd, slots)
    return fs, slots


fs1, slots1 = step(fs, slots, times, seqs, w, a, times[:, -1], meas)
jax.block_until_ready(fs1.cov)

logdir = "/tmp/xmat_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir, create_perfetto_trace=True):
    for _ in range(3):
        fs1, slots1 = step(fs1, slots1, times, seqs, w, a, times[:, -1], meas)
    jax.block_until_ready(fs1.cov)

traces = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", traces)
agg = defaultdict(float)
cnt = defaultdict(int)
total = 0.0
for tf_ in traces:
    with gzip.open(tf_, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid = ev.get("pid")
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # ms
        args = ev.get("args", {})
        # keep device-side events only (heuristic: they carry run_id/hlo info)
        if "tid" in ev and isinstance(args, dict) and ("long_name" in args or "hlo_op" in args or name.startswith("fusion") or True):
            agg[name] += dur
            cnt[name] += 1
            total += dur

top = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
for name, ms in top:
    print(f"{ms:9.3f} ms  x{cnt[name]:4d}  {name[:120]}")
