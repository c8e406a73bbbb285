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

# --- custom-call-free paths vs native, at bench batch (128 agents) ---
from x_multi_agent_tpu.ops import linalg as xl

B2 = 128
a2 = jnp.asarray(rng.normal(size=(B2, D, D)), jnp.float32)
spd2 = jnp.einsum("bij,bkj->bik", a2, a2) + 10.0 * jnp.eye(D, dtype=jnp.float32)
rhs = jnp.asarray(rng.normal(size=(B2, D, D)), jnp.float32)

timeit("xl.chol_blocked (128,151,151)", jax.vmap(xl.chol_blocked), spd2)
timeit("xl.spd_solve (128,151,151)x151", jax.vmap(xl.spd_solve), spd2, rhs)
timeit("native chol (128,151,151)", jnp.linalg.cholesky, spd2)


def native_spd_solve(s, b):
    return jax.scipy.linalg.cho_solve((jnp.linalg.cholesky(s), True), b)


timeit("native cho_solve (128,151,151)x151", jax.vmap(native_spd_solve), spd2, rhs)

l2 = jnp.linalg.cholesky(spd2)
timeit("xl.tri_solve_lower (128)", jax.vmap(xl.tri_solve_lower), l2, rhs)
timeit("native solve_triangular (128)",
       lambda l, b: jax.scipy.linalg.solve_triangular(l, b, lower=True), l2, rhs)
