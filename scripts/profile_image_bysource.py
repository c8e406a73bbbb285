"""Per-source-line device profile of the image pipeline step (VERDICT r4
weak item 6: measured kernel timings for the SCALING.md roofline claims).

Same methodology as profile_bysource.py, applied to the bench_image
program at a small step count so the trace stays under the event cap.
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
from x_multi_agent_tpu.vio import vio as vio_mod
from x_multi_agent_tpu.vision import camera as cam_mod, tracker as trk_mod

A = int(os.environ.get("BENCH_AGENTS", "16"))
K = int(os.environ.get("PROF_STEPS", "3"))
params = ge._params(small=False)

h, w = 480, 640
j = params.cfg.tracks.n_matches
tparams = trk_mod.TrackerParams(
    budget=j, fast_threshold=12.0, n_feat_min=max(60, j // 3),
    n_tiles_h=4, n_tiles_w=4, max_feat_per_tile=40,
    block_half_length=12, margin=12, pyramid_depth=2, win_half=10,
    lk_max_level=2, ransac_threshold_px=1.0,
)
cam = cam_mod.Camera.from_fractional(0.8, 0.8 * w / h, 0.5, 0.5, 0.0, w, h)
frames, imu = bench._orbit_frames(A, 8 + K, h, w, 0.8 * w)
bench._sync(frames[-1])

fs, slots = vio_mod.init_at_time(params, 0.0)
stack = lambda x: jnp.broadcast_to(x, (A,) + x.shape)
fs = jax.tree.map(stack, fs)
slots = jax.tree.map(stack, slots)
tstate = trk_mod.TrackerState.zero(tparams, h, w, jnp.float32)
tstate = jax.tree.map(stack, tstate)
one_agent = bench._filter_step(params)


def body(carry, inp):
    tstate, fs, slots = carry
    imgs, times, seqs, w_, a_, meas_time = inp
    tstate, matches = trk_mod.track_frame_batch(tparams, cam, tstate, imgs)
    fs, slots, applied = jax.vmap(one_agent)(
        fs, slots, times, seqs, w_, a_, meas_time, matches
    )
    chk = jnp.sum(applied) + jnp.sum(tstate.pts[:, 0]) + jnp.sum(fs.cov[:, 0, 0])
    return (tstate, fs, slots), chk


run = jax.jit(lambda c, fr, im: jax.lax.scan(body, c, (fr,) + im))
cut = lambda t, lo, hi: jax.tree.map(lambda x: x[lo:hi], t)

# warm state + compile over 8 frames (tracker must be tracking steadily)
carry, chks = run((tstate, fs, slots), frames[:8], cut(imu, 0, 8))
bench._sync(chks)

# HLO source map of the K-step program
txt = (
    run.lower(carry, frames[8 : 8 + K], cut(imu, 8, 8 + K)).compile().as_text()
)
src_of, op_of = {}, {}
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

outdir = "/tmp/jaxtrace_img2"
os.system(f"rm -rf {outdir}")
jax.profiler.start_trace(outdir)
carry, chks = run(carry, frames[8 : 8 + K], cut(imu, 8, 8 + K))
bench._sync(chks)
jax.profiler.stop_trace()

files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
by_src = collections.defaultdict(float)
by_file = collections.defaultdict(float)
unattr = collections.defaultdict(float)
n_ev = 0
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
        n_ev += 1
        d = e.get("dur", 0)
        key = src_of.get(nm)
        if key is None:
            op = op_of.get(nm)
            unattr[(op.split("/")[-1] + " :: " + nm) if op else nm] += d
        else:
            by_src[key] += d
            by_file[key.split(":")[0]] += d

total = sum(by_src.values()) + sum(unattr.values())
print(f"events={n_ev} total {total/1e3/K:.2f} ms/step at {A} agents")
print("== by FILE ==")
for k, v in sorted(by_file.items(), key=lambda kv: -kv[1])[:16]:
    print(f"  {v/1e3/K:8.3f} ms/step  {k}")
print("== by line ==")
for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
    print(f"  {v/1e3/K:8.3f} ms/step  {k}")
print("== unattributed ==")
for k, v in sorted(unattr.items(), key=lambda kv: -kv[1])[:12]:
    print(f"  {v/1e3/K:8.3f} ms/step  {k[:110]}")
