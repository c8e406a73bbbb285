"""Compare SPD-solve strategies and matmul precisions for the Kalman path
at batch sizes 1 and 128 (scan-amortized device timing)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench

bench._enable_compile_cache()

from x_multi_agent_tpu.ops import linalg

D = 150
K = int(os.environ.get("PROF_STEPS", "30"))


def make_s(a_batch, seed, cond=1e3):
    r = np.random.default_rng(seed)
    q, _ = np.linalg.qr(r.normal(size=(a_batch, D, D)))
    lam = np.logspace(0, np.log10(cond), D)[None, :, None]
    s = np.einsum("bij,bjk->bik", q * lam.transpose(0, 2, 1), q.transpose(0, 2, 1))
    s = 0.5 * (s + s.transpose(0, 2, 1)) + np.eye(D)
    b = r.normal(size=(a_batch, D, D))
    return jnp.asarray(s, jnp.float32), jnp.asarray(b, jnp.float32)


def timeit(name, fn, a_batch):
    xs0 = make_s(a_batch, 0)
    xs1 = make_s(a_batch, 1)
    sss = lambda xs: jnp.stack([xs[0]] * K) + jnp.arange(K)[:, None, None, None] * 1e-7
    run = jax.jit(
        lambda s_all, b: jax.lax.scan(
            lambda c, s_: (c, jnp.sum(fn(s_, b))), 0.0, s_all
        )[1]
    )
    bench._sync(run(sss(xs0), xs0[1]))
    t0 = time.perf_counter()
    bench._sync(run(sss(xs1), xs1[1]))
    dt = time.perf_counter() - t0
    print(f"{name:46s} A={a_batch:4d} {dt/K*1e3:8.3f} ms/step", flush=True)


def ns(s, b):
    return jax.vmap(linalg.spd_solve)(s, b)


def chol_native(s, b):
    l = jnp.linalg.cholesky(s)
    y = jax.scipy.linalg.solve_triangular(l, b, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(l, -1, -2), y, lower=False
    )


def chol_blocked_path(s, b):
    return jax.vmap(linalg.spd_solve_chol)(s, b)


def lu_solve(s, b):
    return jnp.linalg.solve(s, b)


for a_batch in (1, 128):
    for prec in ("default", "highest"):
        with jax.default_matmul_precision(prec):
            timeit(f"NS spd_solve ({prec})", ns, a_batch)
            timeit(f"native chol+trisolve ({prec})", chol_native, a_batch)
            if a_batch == 1:
                timeit(f"blocked chol (ours, {prec})", chol_blocked_path, a_batch)
            timeit(f"LU solve ({prec})", lu_solve, a_batch)

# accuracy spot check
s, b = make_s(4, 7)
x1 = ns(s, b)
x2 = chol_native(s, b)
err = jnp.max(jnp.abs(s @ x1 - b)) / jnp.max(jnp.abs(b))
err2 = jnp.max(jnp.abs(s @ x2 - b)) / jnp.max(jnp.abs(b))
print(f"resid NS={float(err):.2e} chol={float(err2):.2e}")
print("done", flush=True)
