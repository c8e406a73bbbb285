"""Fine-grained stage timing of the EKF wrapper and visual update."""
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
from x_multi_agent_tpu.ekf import buffer as rb
from x_multi_agent_tpu.ekf import ekf as ekf_mod
from x_multi_agent_tpu.ops import linalg
from x_multi_agent_tpu.vio import pipeline, state_manager as sm, track_manager as tm, vio as vio_mod
from x_multi_agent_tpu.vio.updates import msckf, msckf_slam, slam

params = ge._params(small=False)
cfg = params.cfg
ekfp = params.ekf_params
dims = cfg.dims
n_agents = int(os.environ.get("BENCH_AGENTS", "32"))
n_iters = 30

fs0, slots0 = vio_mod.init_at_time(params, 0.0)
stack = lambda x: jnp.broadcast_to(x, (n_agents,) + x.shape)
fs = jax.tree.map(stack, fs0)
slots = jax.tree.map(stack, slots0)

j = cfg.tracks.n_matches
rng = np.random.default_rng(0)
matches = tm.Matches.of(
    track_id=jnp.broadcast_to(jnp.arange(j, dtype=jnp.int32), (n_agents, j)),
    prev_pt=jnp.asarray(rng.normal(size=(n_agents, j, 2)) * 0.2, jnp.float32),
    cur_pt=jnp.asarray(rng.normal(size=(n_agents, j, 2)) * 0.2, jnp.float32),
    valid=jnp.ones((n_agents, j), bool),
)
meas = jax.vmap(lambda m: pipeline.FrameMeasurement.from_matches(cfg, m))(matches)

core = jax.vmap(ekf_mod.tail_core)(fs)
cov = fs.cov
vision = fs.vision
d = dims.d
dtype = jnp.float32

kk = cfg.tracks.n_slam  # slam slot count
m, n = dims.n_poses, dims.n_features


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters
    print(f"{name:32s} {dt*1e3:8.2f} ms")
    return out


# --- EKF wrapper pieces ---
@jax.jit
@jax.vmap
def cov_at(fs):
    return ekf_mod._cov_at(ekfp, fs, fs.head)


timeit("ekf._cov_at (64 steps)", cov_at, fs)


@jax.jit
@jax.vmap
def reprop(fs):
    return ekf_mod._repropagate_tail(ekfp, fs, fs.anchor_buf_idx)


timeit("ekf._repropagate_tail", reprop, fs)


# --- visual update pieces ---
@jax.jit
@jax.vmap
def stage_tracks(core, slots, matches):
    from x_multi_agent_tpu.ekf.state import camera_orientation

    q_cur = camera_orientation(core, jnp.asarray(cfg.q_ic, dtype))
    return tm.manage_tracks(
        cfg.tracks, slots, matches, vision.q_arr[0], q_cur,
        cfg.min_track_length, cfg.msckf_baseline_x_n, cfg.msckf_baseline_y_n,
    )


slots1, frame, slam_z = timeit("tm.manage_tracks", stage_tracks, core, slots, matches)


@jax.jit
@jax.vmap
def stage_short(frame, vision, cov):
    rows, _ = msckf.build(
        frame.short_obs, frame.short_mask, vision.q_arr, vision.p_arr,
        cov, cfg.sigma_img, n, oc=cfg.obs_constrained,
    )
    return rows


short_rows = timeit("msckf.build (short)", stage_short, frame, vision, cov)


@jax.jit
@jax.vmap
def stage_apply(cov, rows):
    return pipeline._apply_rows(cov, rows.jac, rows.res, rows.noise_std, jnp.zeros(d, dtype))


timeit("_apply_rows (short rows)", stage_apply, cov, short_rows)


@jax.jit
@jax.vmap
def stage_manage(core, vision, cov, frame):
    return sm.manage(
        dims, core, vision, cov, frame.lost_slam,
        jnp.asarray(cfg.q_ic, dtype), jnp.asarray(cfg.p_ic, dtype),
    )


timeit("sm.manage", stage_manage, core, vision, cov, frame)


@jax.jit
@jax.vmap
def stage_msckf(frame, vision, cov):
    rows, _ = msckf.build(
        frame.msckf_obs, frame.msckf_mask, vision.q_arr, vision.p_arr,
        cov, cfg.sigma_img, n, oc=cfg.obs_constrained,
    )
    return rows


timeit("msckf.build (msckf)", stage_msckf, frame, vision, cov)


@jax.jit
@jax.vmap
def stage_mslam(frame, vision, cov):
    new_mask_ms = frame.new_mask & frame.new_is_msckf[:, None]
    return msckf_slam.build(
        frame.new_obs, new_mask_ms, vision.q_arr, vision.p_arr, cov, cfg.sigma_img, n,
    )


_, ms_init = timeit("msckf_slam.build", stage_mslam, frame, vision, cov)


@jax.jit
@jax.vmap
def stage_slam(vision, cov, slam_z, frame, slots):
    return slam.build(
        vision.f_arr, vision.anchor_idx, vision.q_arr, vision.p_arr,
        slam_z, frame.slam_has_obs, jnp.minimum(slots.slam_length, m), cov,
        m - 1, cfg.sigma_img,
    )


timeit("slam.build", stage_slam, vision, cov, slam_z, frame, slots1)


@jax.jit
@jax.vmap
def stage_init(vision, cov, frame, ms_init):
    std_z = frame.new_obs[:, m - 1]
    accepted = frame.new_valid
    return sm.init_new_features(
        dims, vision, cov, frame.new_is_msckf,
        ms_init.h1, ms_init.h2, ms_init.r1, ms_init.features,
        std_z, accepted, jnp.zeros(d, dtype), cfg.sigma_img, cfg.rho_0, cfg.sigma_rho_0,
    )


timeit("sm.init_new_features", stage_init, vision, cov, frame, ms_init)

print("track dims:", cfg.tracks)
