"""Drive the VIO facade on the real TPU chip (verify surface #1)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/xmat_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from x_multi_agent_tpu.utils.sim import make_circle_sim
from x_multi_agent_tpu.vio import track_manager as tm, vio as vio_mod
from tests.test_vio_e2e import PARAMS, TRACKS

sim = make_circle_sim(
    duration=2.0, imu_rate=100.0, cam_rate=10.0, n_landmarks=30,
    match_budget=TRACKS.n_matches, pixel_noise=1e-3, seed=0,
)
params = PARAMS._replace(cfg=PARAMS.cfg._replace(sigma_img=1e-3))
v = vio_mod.VIO(params)
v.init_at_time(0.0, v=np.array([1.8, 0.0, 0.0]))

imu_t = np.asarray(sim.imu_t)
cam_t = np.asarray(sim.cam_t)
k = 0
errs = []
for f in range(len(cam_t)):
    while k < len(imu_t) and imu_t[k] <= cam_t[f] + 1e-9:
        v.process_imu(imu_t[k], k, sim.imu_w[k], sim.imu_a[k])
        k += 1
    matches = tm.Matches.of(
        track_id=jnp.asarray(sim.match_id[f]),
        prev_pt=jnp.asarray(sim.match_prev[f]),
        cur_pt=jnp.asarray(sim.match_cur[f]),
        valid=jnp.asarray(sim.match_valid[f]),
    )
    applied = v.process_matches_measurement(cam_t[f], f, matches)
    p = np.asarray(v.anchor_state().p)
    err = float(np.linalg.norm(p - np.asarray(sim.cam_p[f])))
    nan = bool(np.isnan(p).any())
    errs.append(err)
    print(f"frame {f:2d} t={cam_t[f]:.2f} applied={bool(applied)} err={err:.4f} nan={nan}")
    if nan:
        print("NAN DETECTED — aborting")
        break

print("final err:", errs[-1], "max err:", max(errs))
