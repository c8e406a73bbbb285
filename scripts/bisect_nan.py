"""Bisect the TPU f32 non-finite covariance: run the match-driven bench
at small scale and report WHERE finiteness first breaks."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench

bench._enable_compile_cache()

import __graft_entry__ as ge
from x_multi_agent_tpu.vio import vio as vio_mod

A = int(os.environ.get("BENCH_AGENTS", "8"))
CH = int(os.environ.get("CHUNK", "32"))
NCH = int(os.environ.get("NCHUNKS", "8"))

params = ge._params(small=False)
rng = np.random.default_rng(0)
fs, slots = vio_mod.init_at_time(params, 0.0, v=np.asarray(bench.SIM_V0))
stack = lambda x: jnp.broadcast_to(x, (A,) + x.shape)
fs = jax.tree.map(stack, fs)
slots = jax.tree.map(stack, slots)
one_agent = bench._filter_step(params)


def body(carry, inp):
    fs, slots = carry
    fs, slots, applied = jax.vmap(one_agent)(fs, slots, *inp)
    return (fs, slots), jnp.sum(applied)


run = jax.jit(lambda c, xs: jax.lax.scan(body, c, xs))
carry = (fs, slots)
for ci in range(NCH):
    xs = bench._match_inputs_stacked(params, A, CH, rng, frame0=ci * CH)
    carry, chks = run(carry, xs)
    fs1 = carry[0]
    cov_fin = bool(jnp.isfinite(fs1.cov).all())
    ev = np.linalg.eigvalsh(np.asarray(fs1.cov[0], np.float64)) if cov_fin else None
    buf_fin = bool(jnp.isfinite(fs1.buffer).all())
    napp = float(chks[-1])
    nv = np.asarray(fs1.vision.n_valid_features)
    print(
        f"chunk {ci}: frames {(ci+1)*CH}: cov_finite={cov_fin} "
        f"buf_finite={buf_fin} applied_last={napp:.0f}/{A} "
        f"n_feat[min,max]=({nv.min()},{nv.max()}) "
        + (f"eig[min,max]=({ev.min():.2e},{ev.max():.2e})" if ev is not None else ""),
        flush=True,
    )
    if not cov_fin:
        # which agents
        bad = np.where(~np.asarray(jnp.isfinite(fs1.cov).all(axis=(1, 2))))[0]
        print("bad agents:", bad[:16])
        break
