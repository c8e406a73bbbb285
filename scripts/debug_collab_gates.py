"""Stage-by-stage bisect of the request-response SLAM-SLAM fusion gates.

Drives two agents through the real image replay for N frames, then runs
ONE receive (peer keyframe -> fuse_with_peer_desc) with every gate
combination, printing how many matches survive each stage:

  kNN(ratio+abs) -> epipolar RANSAC -> pairwise-distance consistency ->
  refuse-cooldown -> chi2(3) + downhill trace gate (n_applied)

Usage: python scripts/debug_collab_gates.py [--frames 120]
"""
import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ate_report as ar  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    args = ap.parse_args()

    import bench

    bench._enable_compile_cache()

    import jax.numpy as jnp

    from x_multi_agent_tpu.parallel import collab as collab_mod
    from x_multi_agent_tpu.place_recognition.descriptors import knn2_match
    from x_multi_agent_tpu.place_recognition.vocabulary import load_dbow3
    from x_multi_agent_tpu.utils import dataio

    metas = ar.ensure_dataset(3, 60.0, 480, 640, degraded_idx=1)
    words = jnp.asarray(
        load_dbow3(
            "/root/reference/Vocabulary/thermal_voc_3_4_dbow3_calib.yaml"
        ).words
    )
    ccfg = collab_mod.CollabConfig(
        sigma_landmark=0.1, ci_slam_w=-0.02, match_budget=6,
        desc_ratio_thr=0.7, desc_abs_thr=35.0, pr_score_thr=0.15,
        pr_ransac_thr=0.005, geom_consistency_tol=0.3, refuse_cooldown=10,
    )
    agents = [
        ar.build_agent(metas[a], a == 1, words, ccfg, a, collab=True)
        for a in (0, 2)
    ]
    data = [dataio.load_euroc_style(metas[a]["dir"], time_scale=1.0) for a in (0, 2)]
    imgs = [dataio.load_pgm_batch(d.cam_paths[: args.frames], n_threads=4) for d in data]
    n_per = int(round((len(data[0].imu_t) - 1) / len(data[0].cam_t)))
    for f in range(args.frames):
        for v, d, im in zip(agents, data, imgs):
            i = f * n_per + 1
            j = min(i + n_per, len(d.imu_t))
            v.process_imu_batch(d.imu_t[i:j], np.arange(i, j), d.imu_w[i:j], d.imu_a[i:j])
            v.process_image_measurement(float(d.cam_t[f]), f, im[f])
        if f % 20 == 19:
            print(f"frame {f+1}", flush=True)

    va, vb = agents
    payload = vb.get_data_to_send()
    slots = va.slots
    fs = va.fs

    # stage 1: kNN
    other_idx, ok = knn2_match(
        slots.slam_desc, slots.slam_desc_valid,
        payload.slam_desc, payload.slam_desc_valid,
        ccfg.desc_ratio_thr, ccfg.desc_abs_thr,
    )
    n_knn = int(np.asarray(ok).sum())
    print("own slam slots valid:", int(np.asarray(slots.slam_desc_valid).sum()),
          "| peer:", int(np.asarray(payload.slam_desc_valid).sum()))
    print("stage kNN(ratio+abs):", n_knn)

    variants = dict(
        full=dict(),
        no_ransac=dict(pr_ransac_thr=0.0),
        no_geom=dict(geom_consistency_tol=0.0),
        no_cooldown=dict(refuse_cooldown=0),
        no_gates=dict(pr_ransac_thr=0.0, geom_consistency_tol=0.0,
                      refuse_cooldown=0),
        no_gates_posw=dict(pr_ransac_thr=0.0, geom_consistency_tol=0.0,
                           refuse_cooldown=0, ci_slam_w=0.02),
        posw_only=dict(ci_slam_w=0.02),
    )
    for name, over in variants.items():
        cc = ccfg._replace(**over)
        _, n, _ = collab_mod.fuse_with_peer_desc(
            va.params, cc, fs, slots, payload, True,
            recency=None,
        )
        print(f"variant {name:14s}: n_applied = {int(n)}")

    # the REAL replay path: served (stale) keyframe via REQUEST_COMM
    vlad = va.get_descriptors()
    kf, found = vb.process_other_requests(0, vlad)
    print("keyframes in B:", vb.n_keyframes_selected, "| hit:", found)
    if found:
        n = va.process_other_measurements(kf, uav_id=2)
        print("rr fused via served keyframe:", n)


    # keyframe-content probe
    if found and os.environ.get("KF_PROBE"):
        from x_multi_agent_tpu.ekf import buffer as rb
        from x_multi_agent_tpu.ops.ransac import fundamental_ransac
        import jax

        oi2, ok2 = knn2_match(
            slots.slam_desc, slots.slam_desc_valid,
            kf.slam_desc, kf.slam_desc_valid,
            ccfg.desc_ratio_thr, ccfg.desc_abs_thr,
        )
        print("kf slam_desc_valid:", int(np.asarray(kf.slam_desc_valid).sum()),
              "kNN ok:", int(np.asarray(ok2).sum()))
        print("kf landmark_valid:", int(np.asarray(kf.landmark_valid).sum()))
        print("kf time:", float(kf.time), "fs tail:",
              float(np.asarray(rb.times(fs.buffer)[fs.head])))
        m = va.params.cfg.dims.n_poses
        own_pts = slots.slam_obs[:, m - 1]
        peer_pts = kf.slam_obs[np.asarray(oi2)]
        inl, _ = fundamental_ransac(
            own_pts, peer_pts, ok2, jax.random.PRNGKey(0), ccfg.pr_ransac_thr
        )
        print("after ransac:", int(np.asarray(inl & ok2).sum()))
        for name, over in variants.items():
            cc = ccfg._replace(**over)
            _, n2, _ = collab_mod.fuse_with_peer_desc(
                va.params, cc, fs, slots, kf, True, recency=None,
            )
            print(f"KF variant {name:14s}: n_applied = {int(n2)}")


if __name__ == "__main__":
    main()
