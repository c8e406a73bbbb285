"""Controlled solo-replay diagnostics for the 60 s thermal dataset.

Isolates which stage injects the filter overconfidence / divergence seen
in the round-4 solo passes (NEES 40+ from ~4 s, agent-0 runaway at ~42 s):

  --no-photo        disable the online photometric correction entirely
  --no-spatial      global gain correction only (no spatial map)
  --clean-thermal   replay a dataset variant rendered WITHOUT the baked
                    thermal degradation (separate dataset dir)
  --sigma-img-px X  tracker/filter image noise in pixels (default 2.0)
  --imu-scale X     scale all ImuNoise densities (default 1.0)
  --no-oc           disable the observability-constrained projection
  --no-health       disable the health monitor (no auto re-init)
  --frames N        replay only the first N frames (default 250)
  --agent K         which agent's dataset (default 0)

Prints a one-line JSON summary; writes no caches.
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ate_report as ar  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agent", type=int, default=0)
    ap.add_argument("--frames", type=int, default=250)
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--sigma-img-px", type=float, default=2.0)
    ap.add_argument("--imu-scale", type=float, default=1.0)
    ap.add_argument("--no-photo", action="store_true")
    ap.add_argument("--no-spatial", action="store_true")
    ap.add_argument("--no-oc", action="store_true")
    ap.add_argument("--no-health", action="store_true")
    ap.add_argument("--clean-thermal", action="store_true")
    ap.add_argument("--degraded", action="store_true")
    ap.add_argument("--tag", type=str, default="diag")
    args = ap.parse_args()

    import bench

    bench._enable_compile_cache()

    if args.clean_thermal:
        # render a thermal-free variant of the same trajectory
        from x_multi_agent_tpu.utils import scene

        adir = os.path.join(ar.DATASET_ROOT, f"agent{args.agent}_clean")
        meta_p = os.path.join(adir, "meta.json")
        if not os.path.exists(meta_p):
            print("generating clean-thermal dataset...", flush=True)
            tex = scene.make_texture(0)
            info = scene.generate_agent_dataset_6dof(
                adir, seed=100 + args.agent, duration=args.duration,
                h=480, w=640, phase=0.15 * args.agent, tex=tex,
                wall2_x=4.0, thermal=None,
                z_amp=ar.MOTION["z_amp"], yaw_amp=ar.MOTION["yaw_amp"],
                pitch_amp=ar.MOTION["pitch_amp"],
                roll_amp=ar.MOTION["roll_amp"],
            )
            meta = dict(
                duration=args.duration, h=480, w=640, fx=info["fx"],
                fy=info["fy"], v0=list(map(float, info["v0"])),
                p0=list(map(float, info["p0"])),
                q0=list(map(float, info["q0"])),
                gen_key="clean",
            )
            with open(meta_p, "w") as f:
                json.dump(meta, f)
        with open(meta_p) as f:
            meta = json.load(f)
        gt = np.loadtxt(os.path.join(adir, "gt.csv"), delimiter=",", comments="#")
        meta = dict(meta, cam_t=gt[:, 0], cam_p=gt[:, 1:4], dir=adir)
    else:
        metas = ar.ensure_dataset(
            args.agent + 1, args.duration, 480, 640,
            degraded_idx=args.agent if args.degraded else -1,
        )
        meta = metas[args.agent]

    overrides = dict(
        sigma_img_px=args.sigma_img_px,
        imu_noise_scale=args.imu_scale,
        obs_constrained=not args.no_oc,
    )
    if args.no_photo:
        overrides["photometric"] = None
    elif args.no_spatial:
        overrides["photometric"] = dict(
            n_obs=80, spatial=False, cell_px=80, spatial_every=20
        )
    if args.no_health:
        overrides["health"] = None

    v = ar.build_agent(
        meta, args.degraded, None, None, args.agent, collab=False,
        overrides=overrides,
    )
    r = ar.replay(
        [v], [meta], exchange=False, max_frames=args.frames,
        trace_path=os.path.join(
            ar.DATASET_ROOT, f"trace_{args.tag}_a{args.agent}.npz"
        ),
    )
    out = dict(
        tag=args.tag, agent=args.agent, frames=args.frames,
        overrides={k: bool(v) if isinstance(v, dict) else v
                   for k, v in overrides.items()},
        clean_thermal=args.clean_thermal,
        ate=round(r["ate"][0], 4),
        ate_aligned=round(r["ate_aligned"][0], 4),
        final_err=round(r["final_err"][0], 4),
        mean_nees=round(r["mean_nees"][0], 2),
        max_nees=round(r["max_nees"][0], 1),
        n_reinits=r["n_reinits"][0],
        wall_s=r["wall_s"],
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
