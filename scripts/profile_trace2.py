"""Trace the slow program and dump per-op durations."""
import os, time, glob, gzip, json

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
from x_multi_agent_tpu.vio import vio as vio_mod
import __graft_entry__ as ge

A = 32
params = ge._params(small=False)
ep = params.ekf_params
fs, slots = vio_mod.init_at_time(params, 0.0)
stack = lambda x: jnp.broadcast_to(x, (A,) + x.shape)
fs = jax.tree.map(stack, fs)


from x_multi_agent_tpu.vio import pipeline
from x_multi_agent_tpu.vio import track_manager as tm

slots = jax.tree.map(stack, slots)
jrng = np.random.default_rng(0)
J = params.cfg.tracks.n_matches
matches = tm.Matches.of(
    track_id=jnp.broadcast_to(jnp.arange(J, dtype=jnp.int32), (A, J)),
    prev_pt=jnp.asarray(jrng.normal(size=(A, J, 2)) * 0.2, jnp.float32),
    cur_pt=jnp.asarray(jrng.normal(size=(A, J, 2)) * 0.2, jnp.float32),
    valid=jnp.ones((A, J), bool),
)
meas = jax.vmap(lambda m: pipeline.FrameMeasurement.from_matches(params.cfg, m))(matches)

def a_(fs, slots, meas):
    return ekf_mod.process_update_aux_impl(
        ep, fs, jnp.float32(0.0),
        lambda c, v, p, s: pipeline.visual_update(params.cfg, c, v, p, s, meas),
        slots)


fa = jax.jit(jax.vmap(a_))
jax.block_until_ready(fa(fs, slots, meas))
t0 = time.perf_counter()
for _ in range(10):
    out = fa(fs, slots, meas)
jax.block_until_ready(out)
print("visual step:", (time.perf_counter() - t0) / 10 * 1e3, "ms", flush=True)

trace_dir = "/tmp/xmat_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        out = fa(fs, slots, meas)
    jax.block_until_ready(out)

# parse the trace for op durations
files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    evs = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    acc = {}
    for e in evs:
        acc[e["name"]] = acc.get(e["name"], 0) + e.get("dur", 0)
    top = sorted(acc.items(), key=lambda kv: -kv[1])[:35]
    for k, v in top:
        print(f"{v/1e3:10.3f} ms  {k[:110]}")
