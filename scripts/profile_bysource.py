"""Bottom-up device profile of the full 128-agent step: join the jax
profiler trace with HLO metadata and aggregate op durations by source
file:line."""
import os
import re
import sys
import glob
import gzip
import json
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

# 1. compiled HLO: map op name -> (source, op_name-path)
txt = run.lower((fs, slots), xs).compile().as_text()
open("/tmp/full_step_hlo.txt", "w").write(txt)
src_of = {}
op_of = {}
pat_src = re.compile(r"source_file=\"([^\"]+)\" source_line=(\d+)")
pat_op = re.compile(r"op_name=\"([^\"]+)\"")
for line in txt.splitlines():
    ls = line.strip()
    m = re.match(r"%?([\w.\-]+) = ", ls)
    if not m:
        continue
    name = m.group(1)
    ms = pat_src.search(ls)
    mo = pat_op.search(ls)
    if ms:
        src_of[name] = f"{ms.group(1).split('/')[-1]}:{ms.group(2)}"
    if mo:
        op_of[name] = mo.group(1)

# 2. trace
carry, chks = run((fs, slots), xs)
bench._sync(chks)
outdir = "/tmp/jaxtrace2"
os.system(f"rm -rf {outdir}")
xs2 = bench._match_inputs_stacked(params, A, K, rng, frame0=K)
jax.profiler.start_trace(outdir)
carry, chks = run(carry, xs2)
bench._sync(chks)
jax.profiler.stop_trace()

files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
by_src = collections.defaultdict(float)
by_srcn = collections.Counter()
unattr = collections.defaultdict(float)
total = 0.0
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        nm = e.get("name", "")
        if nm.startswith("$") or "(" in nm or nm.startswith("np."):
            continue  # host-side python frames
        if re.match(r"^while\.\d+$", nm):
            continue  # outer scan wrapper double-counts its children
        dur = e.get("dur", 0)
        total += dur
        key = src_of.get(nm)
        if key is None:
            # maybe it is a fusion: attribute by op_name path tail
            op = op_of.get(nm)
            if op:
                unattr[op.split("/")[-1] + " :: " + nm] += dur
            else:
                unattr[nm] += dur
        else:
            by_src[key] += dur
            by_srcn[key] += 1

print(f"total attributed+un: {total/1e3/K:.2f} ms/step over {K} steps")
print("== by source line ==")
for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:45]:
    print(f"  {v/1e3/K:8.3f} ms/step x{by_srcn[k]:6d}  {k}")
print("== unattributed ==")
top = sorted(unattr.items(), key=lambda kv: -kv[1])[:25]
for k, v in top:
    print(f"  {v/1e3/K:8.3f} ms/step  {k[:120]}")
