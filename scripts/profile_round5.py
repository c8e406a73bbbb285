"""Round-5 targeted micro-profile: precision and orchestration breakdown
of the 128-agent filter step (scan-amortized, same methodology as
profile_filter_scan.py)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench

bench._enable_compile_cache()

import __graft_entry__ as ge
from x_multi_agent_tpu.ekf import ekf as ekf_mod
from x_multi_agent_tpu.ops import linalg
from x_multi_agent_tpu.vio import pipeline, vio as vio_mod

params = ge._params(small=False)
cfg = params.cfg
ekfp = params.ekf_params
dims = cfg.dims
A = int(os.environ.get("BENCH_AGENTS", "128"))
K = int(os.environ.get("PROF_STEPS", "20"))
dtype = jnp.float32
m, n, d = dims.n_poses, dims.n_features, dims.d

rng = np.random.default_rng(0)
fs0, slots0 = vio_mod.init_at_time(params, 0.0, v=np.asarray(bench.SIM_V0))
stack = lambda x: jnp.broadcast_to(x, (A,) + x.shape)
fs = jax.tree.map(stack, fs0)
slots = jax.tree.map(stack, slots0)

one_agent = bench._filter_step(params)
xs_seed = bench._match_inputs_stacked(params, A, 6, rng)


def full_body(carry, inp):
    fs, slots = carry
    fs, slots, applied = jax.vmap(one_agent)(fs, slots, *inp)
    return (fs, slots), jnp.sum(applied)


(fs, slots), _ = jax.jit(lambda c, xs: jax.lax.scan(full_body, c, xs))(
    (fs, slots), xs_seed
)
bench._sync(fs.cov)
print("state warmed", flush=True)

core = jax.vmap(ekf_mod.tail_core)(fs)
cov = fs.cov
vision = fs.vision


def timeit2(name, body, xs_lists):
    run = jax.jit(lambda xs: jax.lax.scan(lambda c, x: (c, body(x)), 0, xs)[1])
    bench._sync(run(xs_lists[0]))
    t0 = time.perf_counter()
    bench._sync(run(xs_lists[1]))
    dt = time.perf_counter() - t0
    print(f"{name:44s} {dt/K*1e3:8.3f} ms/step ({A} agents)", flush=True)


def two(mk):
    return [mk(0), mk(1)]


def full_xs(s):
    r2 = np.random.default_rng(100 + s)
    return bench._match_inputs_stacked(params, A, K, r2)


def match_xs(s):
    r2 = np.random.default_rng(100 + s)
    return bench._match_inputs_stacked(params, A, K, r2)[5]


# 1. FULL step (reference point)
timeit2(
    "FULL step",
    lambda x: jnp.sum(jax.vmap(one_agent)(fs, slots, *x)[0].cov[:, 0, 0]),
    two(full_xs),
)


def vu(c_, v_, cv_, s_, m_):
    return pipeline.visual_update(
        cfg, c_, v_, cv_, s_, pipeline.FrameMeasurement.from_matches(cfg, m_)
    )[2][:, 0]


# 2. visual_update at DEFAULT precision (what profile_filter_scan measured)
timeit2(
    "visual_update (default precision)",
    lambda mt: jnp.sum(jax.vmap(vu)(core, vision, cov, slots, mt)),
    two(match_xs),
)

# 3. visual_update at HIGHEST precision (what the real step runs)
timeit2(
    "visual_update (highest precision)",
    lambda mt: jnp.sum(
        linalg.highprec(lambda: jax.vmap(vu)(core, vision, cov, slots, mt))()
    ),
    two(match_xs),
)


# 4. orchestration only: process_update_aux with identity update_fn
def ident_update(c, v, cv, aux):
    return c, v, cv, aux


def orch(x):
    times, seqs, w, a, meas_time, _m = x
    f1 = jax.vmap(
        lambda f_, t, q, ww, aa: ekf_mod.process_imu_batch_impl(ekfp, f_, t, q, ww, aa)
    )(fs, times, seqs, w, a)
    f2, _, app = jax.vmap(
        lambda f_, mt: ekf_mod.process_update_aux_impl(ekfp, f_, mt, ident_update, 0)
    )(f1, meas_time)
    return jnp.sum(f2.cov[:, 0, 0]) + jnp.sum(app)


timeit2("imu_batch + orchestration (ident update)", orch, two(full_xs))

# 5. _cov_at alone
timeit2(
    "_cov_at (lag masked transitions)",
    lambda x: jnp.sum(
        jax.vmap(lambda f_: ekf_mod._cov_at(ekfp, f_, f_.head)[0, 0])(fs)
    )
    + jnp.sum(x[0]) * 0.0,
    two(full_xs),
)

# 6. qr_compress + kalman_update at both precisions, realistic row count
rows_n = cfg.tracks.n_msckf * (2 * m - 3) + cfg.tracks.n_new_slam * (2 * m - 3) + 2 * n + 5
r3 = np.random.default_rng(5)
H0 = jnp.asarray(r3.normal(size=(A, rows_n, d)) * 0.1, dtype)
R0 = jnp.asarray(r3.normal(size=(A, rows_n)) * 0.01, dtype)
S0 = jnp.full((A, rows_n), 0.005, dtype)


def apply_xs(s):
    r4 = np.random.default_rng(10 + s)
    return (
        H0[None] + jnp.asarray(r4.normal(size=(K, A, rows_n, d)) * 1e-4, dtype),
        R0[None] + jnp.asarray(r4.normal(size=(K, A, rows_n)) * 1e-5, dtype),
    )


def apply_body(x, prec):
    h_, r_ = x

    def inner():
        def one(cv_, hh, rr):
            hw, rw = linalg.qr_compress(hh, rr, S0[0])
            corr, cov1 = linalg.kalman_update(cv_, hw, rw, jnp.zeros(d, dtype))
            return corr[0] + cov1[0, 0]

        return jnp.sum(jax.vmap(one)(cov, h_, r_))

    if prec:
        return linalg.highprec(inner)()
    return inner()


timeit2(
    f"qr+kalman rows={rows_n} (default prec)",
    lambda x: apply_body(x, False),
    two(apply_xs),
)
timeit2(
    f"qr+kalman rows={rows_n} (highest prec)",
    lambda x: apply_body(x, True),
    two(apply_xs),
)
print("done", flush=True)
