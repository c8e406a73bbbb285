"""Capture a jax.profiler device trace of the 128-agent full filter step."""
import os
import sys
import glob
import gzip
import json
import time
import collections

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench

bench._enable_compile_cache()

import __graft_entry__ as ge
from x_multi_agent_tpu.vio import vio as vio_mod

params = ge._params(small=False)
A = int(os.environ.get("BENCH_AGENTS", "128"))
K = int(os.environ.get("PROF_STEPS", "10"))

rng = np.random.default_rng(0)
fs0, slots0 = vio_mod.init_at_time(params, 0.0, v=np.asarray(bench.SIM_V0))
stack = lambda x: jnp.broadcast_to(x, (A,) + x.shape)
fs = jax.tree.map(stack, fs0)
slots = jax.tree.map(stack, slots0)
one_agent = bench._filter_step(params)


def body(carry, inp):
    fs, slots = carry
    fs, slots, applied = jax.vmap(one_agent)(fs, slots, *inp)
    return (fs, slots), jnp.sum(applied)


run = jax.jit(lambda c, xs: jax.lax.scan(body, c, xs))
xs = bench._match_inputs_stacked(params, A, K, rng)
carry, chks = run((fs, slots), xs)
bench._sync(chks)
print("warm", flush=True)

outdir = "/tmp/jaxtrace"
os.system(f"rm -rf {outdir}")
xs2 = bench._match_inputs_stacked(params, A, K, rng, frame0=K)
jax.profiler.start_trace(outdir)
carry, chks = run(carry, xs2)
bench._sync(chks)
jax.profiler.stop_trace()
print("traced", flush=True)

files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    evs = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # find TPU device lane events
    bypid = collections.defaultdict(float)
    byname = collections.Counter()
    durname = collections.defaultdict(float)
    for e in evs:
        nm = e.get("name", "")
        durname[nm] += e.get("dur", 0)
        byname[nm] += 1
    top = sorted(durname.items(), key=lambda kv: -kv[1])[:60]
    total = sum(durname.values())
    print(f"== {f}: {len(evs)} events, total dur {total/1e3:.1f} ms")
    for nm, dur in top:
        print(f"  {dur/1e3:9.2f} ms  x{byname[nm]:5d}  {nm[:110]}")
