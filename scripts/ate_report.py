"""Dataset-replay ATE evaluation: the full image pipeline, end-to-end.

Replays a multi-agent EuRoC-style dataset from disk (native IO ->
pyramid/FAST/LK tracker -> fused filter updates -> REQUEST_COMM
collaborative exchange) and reports ATE solo-vs-collaborative for the
degraded agent plus NEES consistency — the evaluation shape of the
reference's released datasets (README.md:284-301; BASELINE.md target:
recover the up-to-46% collaborative improvement).

The dataset is generated deterministically on first use (the reference's
datasets are not vendored): N agents orbiting a shared textured wall,
rendered at ground-truth poses (utils/scene.py).

Usage:
  python scripts/ate_report.py [--duration 30] [--agents 2] [--out ATE_REPORT.json]
"""
import argparse
import faulthandler
import json
import os
import sys
import time

faulthandler.enable()
# periodic stack dump so hangs (e.g. a wedged device tunnel) are diagnosable
faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATASET_ROOT = os.environ.get("XMAT_DATASET_DIR", "/tmp/xmat_dataset")


def ensure_dataset(n_agents: int, duration: float, h: int, w: int):
    """Round-3 dataset shape (VERDICT r2 item 6): 6-DoF motion with real
    rotation + z-bobbing, non-planar scene (front wall + side wall), and
    baked thermal degradation (gain drift + corner vignette + noise) that
    the online photometric path must undo."""
    from x_multi_agent_tpu.utils import scene

    metas = []
    tex = scene.make_texture(0)
    # slow linear gain/bias drift + static corner vignette + noise
    # (empirically the stable regime for 60 s: both the degraded and
    # helper agents complete solo; an oscillating AGC-style gain at
    # +/-8% destabilized the solo filter around 30 s)
    thermal = dict(drift_a=0.004, drift_b=0.001, noise=0.006, vignette=0.06)
    for a in range(n_agents):
        adir = os.path.join(DATASET_ROOT, f"agent{a}_6dof_v2")
        meta_p = os.path.join(adir, "meta.json")
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            if meta["duration"] == duration and meta["h"] == h and meta["w"] == w:
                gt = np.loadtxt(
                    os.path.join(adir, "gt.csv"), delimiter=",", comments="#"
                )
                metas.append(
                    dict(meta, cam_t=gt[:, 0], cam_p=gt[:, 1:4], dir=adir)
                )
                continue
        print(f"generating agent {a} dataset ({duration:.0f}s)...", flush=True)
        info = scene.generate_agent_dataset_6dof(
            adir, seed=100 + a, duration=duration, h=h, w=w,
            phase=0.15 * a, tex=tex, wall2_x=4.0, thermal=thermal,
            yaw_amp=0.10, pitch_amp=0.06, roll_amp=0.05, z_amp=0.2,
        )
        meta = dict(
            duration=duration, h=h, w=w, fx=info["fx"], fy=info["fy"],
            v0=list(map(float, info["v0"])),
            p0=list(map(float, info["p0"])),
            q0=list(map(float, info["q0"])),
        )
        with open(meta_p, "w") as f:
            json.dump(meta, f)
        metas.append(dict(meta, cam_t=info["cam_t"], cam_p=info["cam_p"], dir=adir))
    return metas


def build_agent(meta, degraded: bool, words, ccfg, uav_id: int, collab: bool):
    import jax.numpy as jnp

    from x_multi_agent_tpu.vio import pipeline, vio as vio_mod
    from x_multi_agent_tpu.vio import track_manager as tm
    from x_multi_agent_tpu.ekf.state import StateDims
    from x_multi_agent_tpu.vision import camera as cam_mod, tracker as trk_mod

    dims = StateDims(n_poses=10, n_features=10, buffer_size=128)
    tracks = tm.TrackDims(
        n_slam=10, n_poses=10, n_opp=40, n_matches=100, n_msckf=8,
        n_short=6, n_new_slam=10,
    )
    cfg = pipeline.VioConfig(
        dims=dims, tracks=tracks, sigma_img=2.0 / meta["fx"],
        min_track_length=6, msckf_baseline_x_n=0.02, msckf_baseline_y_n=0.02,
    )
    params = vio_mod.VioParams(
        cfg=cfg, dtype="float32", max_update_lag=16,
        sigma_dp=(0.5,) * 3 if degraded else (1e-3,) * 3,
        sigma_dv=(0.05,) * 3, sigma_dtheta_deg=(1.0,) * 3,
        sigma_dbw_deg=(1.0,) * 3, sigma_dba=(0.05,) * 3,
    )
    v = vio_mod.VIO(params)
    p0 = np.asarray(meta.get("p0", np.zeros(3)), float)
    if degraded:
        p0 = p0 + np.array([0.25, 0.1, 0.0])
    v.init_at_time(
        0.0, p=p0, v=np.asarray(meta["v0"]),
        q=np.asarray(meta.get("q0", [0.0, 0.0, 0.0, 1.0]), float),
    )

    h, w = meta["h"], meta["w"]
    cam = cam_mod.Camera.from_fractional(
        meta["fx"] / w, meta["fy"] / h, 0.5, 0.5, 0.0, w, h
    )
    tparams = trk_mod.TrackerParams(
        budget=tracks.n_matches, fast_threshold=12.0, n_feat_min=60,
        n_tiles_h=4, n_tiles_w=4, max_feat_per_tile=15,
        block_half_length=12, margin=12, pyramid_depth=2, win_half=10,
        lk_max_level=2, ransac_threshold_px=1.0, compute_descriptors=True,
    )
    v.setup_tracker(tparams, cam, h, w)
    # thermal degradation is baked into the dataset; the online global +
    # spatial photometric calibration must undo it (VERDICT r2 item 4/6)
    v.enable_photometric(n_obs=80, spatial=True, cell_px=80, spatial_every=20)
    if collab:
        v.enable_collab(words, uav_id=uav_id, ccfg=ccfg)
    return v


def _aligned_ate(est: np.ndarray, gt: np.ndarray) -> float:
    """SE(3)-aligned ATE RMSE (Umeyama, no scale) — the standard VIO
    trajectory metric: global position/yaw are gauge-unobservable, so the
    raw error is dominated by frame drift on long runs. The reference's
    datasets are evaluated the same way (trajectory alignment before
    ATE)."""
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    ec = est - mu_e
    gc = gt - mu_g
    h = ec.T @ gc
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    aligned = (r @ ec.T).T + mu_g
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1))))


def replay(agents, metas, exchange: bool, log_every: int = 10):
    """Interleaved frame-by-frame replay with periodic exchange rounds."""
    from x_multi_agent_tpu.utils import dataio

    data = [dataio.load_euroc_style(m["dir"], time_scale=1.0) for m in metas]
    imgs = [
        dataio.load_pgm_batch(d.cam_paths, n_threads=4) for d in data
    ]
    n_frames = min(len(d.cam_t) for d in data)
    imu_is = [0] * len(agents)
    errs = [[] for _ in agents]
    nees = [[] for _ in agents]
    est_tr = [[] for _ in agents]
    gt_tr = [[] for _ in agents]
    bytes_rr = 0
    bytes_full = 0
    n_hits = 0
    t0 = time.perf_counter()
    # fixed-stride IMU windows: every frame consumes EXACTLY imu_rate /
    # cam_rate samples, so the whole replay runs one compiled batch shape.
    # Variable-length slicing retraced process_imu_batch mid-run and the
    # fresh compile segfaulted jaxlib after ~450 frames of accumulated
    # executables (known quirk; see tests/conftest.py).
    n_per = int(round((len(data[0].imu_t) - 1) / n_frames))
    for f in range(n_frames):
        for a, (v, d, m) in enumerate(zip(agents, data, metas)):
            t_cam = float(d.cam_t[f])
            i = f * n_per + 1
            j = min(i + n_per, len(d.imu_t))
            if j > i:
                v.process_imu_batch(
                    d.imu_t[i:j], np.arange(i, j), d.imu_w[i:j], d.imu_a[i:j]
                )
            imu_is[a] = j
            v.process_image_measurement(t_cam, f, imgs[a][f])
            p_est = np.asarray(v.tail_state().p)
            p_gt = m["cam_p"][f]
            errs[a].append(np.linalg.norm(p_est - p_gt))
            est_tr[a].append(p_est)
            gt_tr[a].append(p_gt)
            cov_p = np.asarray(v.fs.cov[:3, :3])
            e = np.asarray(v.anchor_state().p) - p_gt
            try:
                nees[a].append(float(e @ np.linalg.solve(cov_p, e)))
            except np.linalg.LinAlgError:
                nees[a].append(np.nan)
        if exchange and f > 10:
            from x_multi_agent_tpu.parallel import collab as collab_mod

            pb = collab_mod.payload_nbytes(agents[0].get_data_to_send())
            vb = collab_mod.vlad_nbytes(agents[0]._words)
            n_pairs = len(agents) * (len(agents) - 1)
            # baseline: the reference's full-exchange mode ships the
            # SimpleState payload to every peer at EVERY visual update
            # (getDataToSend, vio.cpp:440-451) — that is what the paper's
            # up-to-89% reduction is measured against (README.md:98-99)
            bytes_full += pb * n_pairs
            if f % 10 == 9:
                for req in range(len(agents)):
                    for res in range(len(agents)):
                        if req == res:
                            continue
                        vlad = agents[req].get_descriptors()
                        bytes_rr += vb
                        payload, found = agents[res].process_other_requests(req, vlad)
                        if found:
                            bytes_rr += pb
                            n_hits += 1
                            agents[req].process_other_measurements(payload, uav_id=res)
        if f % log_every == log_every - 1:
            print(
                f"frame {f+1}/{n_frames} "
                f"errs={[round(e[-1], 3) for e in errs]} "
                f"hits={n_hits} ({time.perf_counter()-t0:.0f}s)",
                flush=True,
            )
    out = dict(
        ate=[float(np.sqrt(np.mean(np.square(e)))) for e in errs],
        ate_aligned=[
            _aligned_ate(np.asarray(e), np.asarray(g))
            for e, g in zip(est_tr, gt_tr)
        ],
        final_err=[float(e[-1]) for e in errs],
        mean_nees=[float(np.nanmean(n)) for n in nees],
        n_hits=n_hits,
        bytes_rr=bytes_rr,
        bytes_full=bytes_full,
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--agents", type=int, default=4)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--out", type=str, default=os.path.join(REPO, "ATE_REPORT_r03.json"))
    args = ap.parse_args()

    import bench

    bench._enable_compile_cache()

    import jax.numpy as jnp

    from x_multi_agent_tpu.parallel import collab as collab_mod
    from x_multi_agent_tpu.place_recognition.vocabulary import train_kmajority

    metas = ensure_dataset(args.agents, args.duration, args.height, args.width)

    # train a small vocabulary on descriptors of random patches (host-side
    # stand-in for the reference's shipped DBoW3 thermal vocabulary)
    rng = np.random.default_rng(0)
    words = jnp.asarray(
        train_kmajority(
            rng.integers(0, 256, (512, 32)).astype(np.uint8), 32, 7
        ).words
    )
    ccfg = collab_mod.CollabConfig(
        sigma_landmark=0.1, ci_slam_w=-0.02, match_budget=6,
        desc_ratio_thr=0.7, desc_abs_thr=35.0, pr_score_thr=0.15,
        pr_ransac_thr=0.005, geom_consistency_tol=0.3,
        # consistency guards: no SLAM landmark re-fuses against the same
        # peer within 3 receives (collab NEES was 6.4 on 3 dof in r2);
        # negative ci_slam_w = downhill-only information flow (fuse only
        # from more-confident peers — keeps helpers from drifting toward
        # the degraded agent's frame over long runs)
        refuse_cooldown=10,
    )

    # pass 1: degraded agent solo (agent index 1 is the degraded one).
    # The result is cached on disk: a jaxlib/remote-compile crash mid-way
    # through the (long) collab pass then only replays the collab pass on
    # retry — compiled programs come back from the persistent cache.
    solo_cache = os.path.join(DATASET_ROOT, "solo_result.json")
    if os.path.exists(solo_cache):
        with open(solo_cache) as f:
            solo = json.load(f)
        print("=== solo pass: cached result reused ===", flush=True)
    else:
        print("=== solo pass (degraded agent alone) ===", flush=True)
        solo_agent = build_agent(metas[1], True, words, ccfg, 1, collab=False)
        solo = replay([solo_agent], [metas[1]], exchange=False)
        with open(solo_cache, "w") as f:
            json.dump(solo, f)

    # pass 2: all agents, collaborative with REQUEST_COMM exchange
    print("=== collaborative pass ===", flush=True)
    agents = [
        build_agent(metas[a], a == 1, words, ccfg, a, collab=True)
        for a in range(args.agents)
    ]
    col = replay(agents, metas, exchange=True)

    ate_solo = solo["ate_aligned"][0]
    ate_collab = col["ate_aligned"][1]
    gain = 1.0 - ate_collab / ate_solo
    reduction = (
        1.0 - col["bytes_rr"] / col["bytes_full"] if col["bytes_full"] else 0.0
    )
    nees_collab = col["mean_nees"][1]
    # chi2(3) consistency band for the MEAN of ~duration*10 temporally
    # correlated NEES samples (effective sample count conservatively ~N/10)
    nees_ok = 1.5 <= nees_collab <= 4.5
    report = dict(
        dataset=dict(
            agents=args.agents, duration_s=args.duration,
            resolution=[args.height, args.width],
            frames=int(args.duration * 10),
            motion="orbit_6dof (yaw/pitch/roll + z-bob)",
            scene="front wall + side wall (non-planar)",
            thermal="gain drift + corner vignette + noise (baked)",
        ),
        degraded_agent=dict(
            ate_solo_m=round(ate_solo, 4),
            ate_collab_m=round(ate_collab, 4),
            ate_solo_raw_m=round(solo["ate"][0], 4),
            ate_collab_raw_m=round(col["ate"][1], 4),
            collab_gain_pct=round(100 * gain, 1),
            mean_nees_solo=round(solo["mean_nees"][0], 2),
            mean_nees_collab=round(nees_collab, 2),
            nees_consistent=bool(nees_ok),
        ),
        per_agent=dict(
            ate_collab_m=[round(a, 4) for a in col["ate_aligned"]],
            ate_collab_raw_m=[round(a, 4) for a in col["ate"]],
            mean_nees_collab=[round(x, 2) for x in col["mean_nees"]],
        ),
        request_comm=dict(
            hits=col["n_hits"],
            bytes_request_response=col["bytes_rr"],
            bytes_full_broadcast=col["bytes_full"],
            bandwidth_reduction_pct=round(100 * reduction, 1),
        ),
        keyframes_selected=[int(v.n_keyframes_selected) for v in agents],
    )
    print(json.dumps(report, indent=2))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")
    if not nees_ok:
        print(
            f"CONSISTENCY GATE FAILED: collab NEES {nees_collab:.2f} "
            "outside [1.5, 4.5] on 3 dof", file=sys.stderr,
        )
        sys.exit(2)


if __name__ == "__main__":
    main()
