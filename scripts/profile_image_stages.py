"""Per-stage timing of the IMAGE pipeline (tracker) at BENCH_AGENTS agents.

IMPORTANT measurement rule (axon tunnel): repeated calls with IDENTICAL
input buffers return in ~0 time (execution dedup/caching in the tunnel
client). Every timed iteration below therefore uses a DISTINCT input set.
"""
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
from x_multi_agent_tpu.utils import scene
from x_multi_agent_tpu.vision import camera as cam_mod, fast, lk, tracker as trk_mod
from x_multi_agent_tpu.vision.image import bilinear_sample, build_pyramid, scharr_gradients

params = ge._params(small=False)
cfg = params.cfg
n_agents = int(os.environ.get("BENCH_AGENTS", "16"))
n_iters = int(os.environ.get("PROF_ITERS", "8"))

h, w = 480, 640
j = cfg.tracks.n_matches
tparams = trk_mod.TrackerParams(
    budget=j, fast_threshold=12.0, n_feat_min=max(60, j // 3),
    n_tiles_h=4, n_tiles_w=4, max_feat_per_tile=40,
    block_half_length=12, margin=12, pyramid_depth=2, win_half=10,
    lk_max_level=2, ransac_threshold_px=1.0,
)
cam = cam_mod.Camera.from_fractional(0.8, 0.8 * w / h, 0.5, 0.5, 0.0, w, h)

tex = jnp.asarray(scene.make_texture(0, size=2048).astype(np.float32))
yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
grid = jnp.stack([jnp.asarray(xx), jnp.asarray(yy)], axis=-1)


@jax.jit
def render(k):
    def per_agent(aid):
        dx = 700.0 + 23.0 * aid + 2.0 * k
        dy = 700.0 + 17.0 * aid + 1.0 * k
        return bilinear_sample(tex, grid + jnp.asarray([dx, dy]))

    return jax.vmap(per_agent)(jnp.arange(n_agents, dtype=jnp.float32))


def timeit(name, fn, inputs):
    """inputs: list of n_iters+1 arg tuples, all distinct."""
    out = fn(*inputs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for args in inputs[1:]:
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (len(inputs) - 1)
    print(f"{name:36s} {dt*1e3:9.2f} ms", flush=True)
    return out


frames = [render(float(k)) for k in range(n_iters + 2)]
jax.block_until_ready(frames[-1])

timeit("render", render, [(float(k) + 0.5,) for k in range(n_iters + 1)])

pyr_fn = jax.jit(jax.vmap(lambda im: build_pyramid(im, tparams.lk_max_level)))
timeit("build_pyramid", pyr_fn, [(f,) for f in frames[: n_iters + 1]])
pyrs = [pyr_fn(f) for f in frames]
jax.block_until_ready(pyrs[-1])

grad_fn = jax.jit(jax.vmap(lambda im: scharr_gradients(im)))
for lvl in range(len(pyrs[0])):
    timeit(f"scharr lvl{lvl}", grad_fn, [(p[lvl],) for p in pyrs[: n_iters + 1]])

# seed a tracker state per frame pair for distinct LK inputs
tstate0 = trk_mod.TrackerState.zero(tparams, h, w, jnp.float32)
tstate0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_agents,) + x.shape), tstate0)
step_tracker = jax.jit(jax.vmap(lambda ts, im: trk_mod.track_frame(tparams, cam, ts, im)))
tstates = []
ts = tstate0
for k in range(n_iters + 1):
    ts, _ = step_tracker(ts, frames[k])
    tstates.append(ts)
jax.block_until_ready(tstates[-1].pts)

use_pallas = jax.default_backend() == "tpu"
lk_fn = jax.jit(jax.vmap(
    lambda pp, pc, pts, v: lk.track(
        pp, pc, pts, v, half_win=tparams.win_half, n_iters=tparams.lk_iters,
        min_eig_thr=tparams.min_eig_thr, use_pallas=use_pallas)))
lk_inputs = [
    (pyrs[k], pyrs[k + 1], tstates[k].pts, tstates[k].ids >= 0)
    for k in range(n_iters + 1)
]
out = timeit("lk.track (3 levels)", lk_fn, lk_inputs)
cur_pts_list = []
ok_list = []
for args in lk_inputs:
    cp, ok = lk_fn(*args)
    cur_pts_list.append(cp)
    ok_list.append(ok)
jax.block_until_ready(cur_pts_list[-1])

from x_multi_agent_tpu.vision import pallas_lk
if use_pallas:
    grads0 = [grad_fn(p[0]) for p in pyrs]
    jax.block_until_ready(grads0[-1])
    lvl0_fn = jax.jit(jax.vmap(
        lambda ip, ic, dx, dy, pts: pallas_lk.track_level(
            ip, ic, dx, dy, pts, jnp.zeros_like(pts),
            tparams.win_half, tparams.lk_iters, tparams.min_eig_thr)))
    timeit("pallas_lk lvl0 only", lvl0_fn, [
        (pyrs[k][0], pyrs[k + 1][0], grads0[k][0], grads0[k][1], tstates[k].pts)
        for k in range(n_iters + 1)
    ])

fast_fn = jax.jit(jax.vmap(
    lambda im: fast.detect(im, tparams.fast_threshold, tparams.n_tiles_h,
                           tparams.n_tiles_w, tparams.max_feat_per_tile,
                           tparams.non_max_supp, use_pallas=False)))
timeit("fast.detect lvl0 (XLA)", fast_fn, [(p[0],) for p in pyrs[: n_iters + 1]])
fast_fn1 = jax.jit(jax.vmap(
    lambda im: fast.detect(im[: (im.shape[0] // 4) * 4, : (im.shape[1] // 4) * 4],
                           tparams.fast_threshold, tparams.n_tiles_h,
                           tparams.n_tiles_w, tparams.max_feat_per_tile,
                           tparams.non_max_supp, use_pallas=False)))
timeit("fast.detect lvl1 (XLA)", fast_fn1, [(p[1],) for p in pyrs[: n_iters + 1]])

from x_multi_agent_tpu.ops.ransac import fundamental_ransac
keys = [jax.random.split(jax.random.PRNGKey(k), n_agents) for k in range(n_iters + 1)]
ransac_fn = jax.jit(jax.vmap(
    lambda pp, pc, v, k: fundamental_ransac(
        pp, pc, v, k, tparams.ransac_threshold_px, tparams.ransac_hypotheses)))
timeit("fundamental_ransac", ransac_fn, [
    (tstates[k].pts, cur_pts_list[k], ok_list[k], keys[k])
    for k in range(n_iters + 1)
])

timeit("tracker.track_frame (full)", step_tracker, [
    (tstates[k], frames[k + 1]) for k in range(n_iters + 1)
])
print(f"agents={n_agents} backend={jax.default_backend()}", flush=True)
