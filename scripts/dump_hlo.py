"""Dump the optimized HLO of the full 128-agent step and locate the
named ops that dominate the device trace."""
import os
import re
import sys

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
K = 10

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
txt = run.lower((fs, slots), xs).compile().as_text()
out = "/tmp/full_step_hlo.txt"
with open(out, "w") as f:
    f.write(txt)
print("wrote", out, len(txt), "chars")

want = sys.argv[1:] or [
    "custom-call.671", "custom-call.672", "custom-call.673", "custom-call.674",
    "custom-call.675", "custom-call.676", "custom-call.677",
    "dynamic-update-slice.1723", "dynamic-update-slice.1732",
    "fusion.3366", "while.330", "while.336", "fusion.3556",
]
for w in want:
    for line in txt.splitlines():
        if ("%" + w + " ") in line or ("%" + w + "=") in line or (w + " = ") in line:
            print("----", w)
            print(line.strip()[:400])
            break
