"""Split _apply_rows cost: Gram matmul vs chol custom call vs kalman/NS,
at 128 agents (scan-amortized)."""
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

A = int(os.environ.get("BENCH_AGENTS", "128"))
K = int(os.environ.get("PROF_STEPS", "30"))
D = 150
ROWS = int(os.environ.get("ROWS", "710"))

r = np.random.default_rng(0)
# realistic-ish: sparse-ish H with moderate scale, SPD P
H = jnp.asarray(r.normal(size=(A, ROWS, D)) * 0.5, jnp.float32)
RES = jnp.asarray(r.normal(size=(A, ROWS)) * 0.01, jnp.float32)
STD = jnp.full((ROWS,), 0.005, jnp.float32)
q, _ = np.linalg.qr(r.normal(size=(D, D)))
lam = np.logspace(-6, 0, D)
P0 = q @ np.diag(lam) @ q.T
P = jnp.asarray(np.broadcast_to(P0, (A, D, D)), jnp.float32)


def timeit(name, fn):
    def mk(s):
        rr = np.random.default_rng(s)
        return H + jnp.asarray(rr.normal(size=(A, ROWS, D)) * 1e-5, jnp.float32)

    run = jax.jit(
        lambda h0: jax.lax.scan(
            lambda c, i: (c, jnp.sum(fn(h0 + i * 1e-7))), 0.0,
            jnp.arange(K, dtype=jnp.float32),
        )[1]
    )
    bench._sync(run(mk(0)))
    t0 = time.perf_counter()
    bench._sync(run(mk(1)))
    dt = time.perf_counter() - t0
    print(f"{name:44s} {dt/K*1e3:8.3f} ms/step (A={A})", flush=True)


@linalg.highprec
def gram_only(h):
    def one(hh, rr_):
        w = 1.0 / STD
        aug = jnp.concatenate([hh * w[:, None], (rr_ * w)[:, None]], axis=1)
        return (aug.T @ aug)[0, 0]

    return jax.vmap(one)(h, RES)


@linalg.highprec
def qr_only(h):
    def one(hh, rr_):
        hw, rw = linalg.qr_compress(hh, rr_, STD)
        return hw[0, 0] + rw[0]

    return jax.vmap(one)(h, RES)


@linalg.highprec
def full_apply(h):
    def one(cv_, hh, rr_):
        hw, rw = linalg.qr_compress(hh, rr_, STD)
        corr, cov1 = linalg.kalman_update(cv_, hw, rw, jnp.zeros(D, jnp.float32))
        return corr[0] + cov1[0, 0]

    return jax.vmap(one)(P, h, RES)


@linalg.highprec
def chol_native_call(h):
    g = jax.vmap(lambda hh: hh.T @ hh)(h[:, :, : D + 1][:, : D + 1])
    g = g + jnp.eye(min(D + 1, ROWS), dtype=jnp.float32)
    return jnp.sum(jnp.linalg.cholesky(g)[:, 0, 0])


@linalg.highprec
def chol_blocked_ours(h):
    g = jax.vmap(lambda hh: hh.T @ hh)(h[:, :, : D + 1][:, : D + 1])
    g = g + jnp.eye(min(D + 1, ROWS), dtype=jnp.float32)
    return jnp.sum(jax.vmap(linalg.chol_blocked)(g)[:, 0, 0])


timeit("gram matmul only", gram_only)
timeit("qr_compress (gram+native chol)", qr_only)
timeit("full _apply_rows (qr+kalman)", full_apply)
timeit("native chol alone (151)", chol_native_call)
timeit("blocked chol ours (151)", chol_blocked_ours)
print("done", flush=True)
