"""Micro-benchmark of the linalg primitives on the real TPU chip."""
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

B = 32
D = 151
R = 705  # stacked whitened rows

rng = np.random.default_rng(0)
a = jnp.asarray(rng.normal(size=(B, D, D)), jnp.float32)
spd = jnp.einsum("bij,bkj->bik", a, a) + 10.0 * jnp.eye(D, dtype=jnp.float32)
h = jnp.asarray(rng.normal(size=(B, R, D + 1)), jnp.float32)
tri27 = jnp.asarray(rng.normal(size=(B * 10, 27, 27)), jnp.float32)
spd27 = jnp.einsum("bij,bkj->bik", tri27, tri27) + jnp.eye(27, dtype=jnp.float32)
small3 = jnp.asarray(rng.normal(size=(B * 15, 3, 3)), jnp.float32) + 3 * jnp.eye(3, dtype=jnp.float32)


def timeit(name, fn, *args):
    with jax.default_matmul_precision("highest"):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(50):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 50
    print(f"{name:40s} {dt*1e3:8.3f} ms")


timeit("cholesky (32,151,151)", jnp.linalg.cholesky, spd)
timeit("cho_factor+solve (32,151,151)",
       lambda s: jax.vmap(lambda m: jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(m), jnp.eye(D, dtype=jnp.float32)[:, :1]))(s), spd)
timeit("qr r-mode (32,705,152)", lambda x: jnp.linalg.qr(x, mode="r"), h)
timeit("gram (32,705,152)->(152,152)", lambda x: jnp.einsum("bri,brj->bij", x, x), h)
timeit("cholesky (320,27,27)", jnp.linalg.cholesky, spd27)
timeit("inv (480,3,3)", jnp.linalg.inv, small3)
timeit("matmul (32,151,151)@(32,151,151)", lambda x: jnp.einsum("bij,bjk->bik", x, x), spd)
timeit("solve_triangular (32,151,151)",
       lambda s: jax.scipy.linalg.solve_triangular(jnp.tril(s), jnp.ones((B, D, 8), jnp.float32), lower=True), spd)
