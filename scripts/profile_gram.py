"""Sanity-check the tall-skinny Gram matmul cost at A=128."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench

bench._enable_compile_cache()

A, K, D, ROWS = 128, 30, 150, 710
r = np.random.default_rng(0)
H = jnp.asarray(r.normal(size=(A, ROWS, D)) * 0.5, jnp.float32)


def timeit(name, fn):
    run = jax.jit(
        lambda h0: jax.lax.scan(
            lambda c, i: (c, jnp.sum(fn(h0 + i * 1e-7))), 0.0,
            jnp.arange(K, dtype=jnp.float32),
        )[1]
    )
    bench._sync(run(H))
    t0 = time.perf_counter()
    bench._sync(run(H + 1e-5))
    dt = time.perf_counter() - t0
    print(f"{name:44s} {dt/K*1e3:8.3f} ms/step (A={A})", flush=True)


for prec in ("default", "high", "highest"):
    with jax.default_matmul_precision(prec):
        timeit(f"einsum gram ({prec})", lambda h: jnp.einsum("ari,arj->aij", h, h)[:, 0, 0])

with jax.default_matmul_precision("highest"):
    timeit("vmapped h.T@h (highest)", lambda h: jax.vmap(lambda x: x.T @ x)(h)[:, 0, 0])
    timeit(
        "concat+vmapped aug.T@aug (highest)",
        lambda h: jax.vmap(
            lambda x: (lambda aug: (aug.T @ aug)[0, 0])(
                jnp.concatenate([x, x[:, :1]], axis=1)
            )
        )(h),
    )
print("done", flush=True)
