"""Diagnostic driver for the synthetic e2e sequence (not a test)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x_multi_agent_tpu.ekf.state import StateDims
from x_multi_agent_tpu.vio import pipeline, vio as vio_mod
from x_multi_agent_tpu.vio import track_manager as tm
from x_multi_agent_tpu.utils.sim import make_circle_sim

DIMS = StateDims(n_poses=8, n_features=8, buffer_size=64)
TRACKS = tm.TrackDims(
    n_slam=8, n_poses=8, n_opp=40, n_matches=60, n_msckf=8, n_short=6, n_new_slam=8
)
CFG = pipeline.VioConfig(
    dims=DIMS, tracks=TRACKS, sigma_img=2e-3, min_track_length=5,
    msckf_baseline_x_n=0.01, msckf_baseline_y_n=0.01,
)
PARAMS = vio_mod.VioParams(
    cfg=CFG, dtype="float64", max_update_lag=32,
    sigma_dv=(0.05, 0.05, 0.05), sigma_dtheta_deg=(1.0, 1.0, 1.0),
    sigma_dbw_deg=(1.0, 1.0, 1.0), sigma_dba=(0.05, 0.05, 0.05),
)

sim = make_circle_sim(duration=3.0, imu_rate=100.0, cam_rate=10.0,
                      n_landmarks=30, match_budget=60, pixel_noise=5e-4, seed=1)
v = vio_mod.VIO(PARAMS)
v.init_at_time(0.0, v=np.array([1.5 * 1.2, 0.0, 0.0]))

imu_i = 0
for f, t_cam in enumerate(sim.cam_t):
    while imu_i < len(sim.imu_t) and sim.imu_t[imu_i] <= t_cam + 1e-9:
        v.process_imu(sim.imu_t[imu_i], imu_i, sim.imu_w[imu_i], sim.imu_a[imu_i])
        imu_i += 1
    matches = tm.Matches.of(
        track_id=jnp.asarray(sim.match_id[f]),
        prev_pt=jnp.asarray(sim.match_prev[f]),
        cur_pt=jnp.asarray(sim.match_cur[f]),
        valid=jnp.asarray(sim.match_valid[f]),
    )
    applied = v.process_matches_measurement(t_cam, f, matches)
    tail = v.tail_state()
    err = np.linalg.norm(np.array(tail.p) - sim.cam_p[f])
    vis = v.fs.vision
    sl = v.slots
    print(
        f"f={f:02d} applied={applied} err={err:.4f} nfeat={int(vis.n_valid_features)}"
        f" nposes={int(vis.n_valid_poses)}"
        f" opp_active={int((sl.opp_id>=0).sum())}"
        f" slam_active={int((sl.slam_id>=0).sum())}"
        f" opp_maxlen={int(sl.opp_length.max())}"
        f" covtr={float(jnp.trace(v.fs.cov)):.4f}"
        f" f_rho={np.array(vis.f_arr[:3,2]).round(3)}"
    )
print("true v0:", (1.5*1.2))
