"""Benchmark: per-agent EKF visual-update throughput + image-pipeline
frame rate on one chip.

Measurement methodology (IMPORTANT): the axon TPU tunnel adds a
per-dispatch round-trip that varies 3-35 ms between sessions, and
``jax.block_until_ready`` does not reliably wait for queued async work.
Every timed program here therefore runs K chained steps inside ONE jitted
``lax.scan`` dispatch and synchronizes by pulling a scalar checksum; the
single round-trip is amortized over K steps (and reported as ``rtt_ms``).
Inputs differ per step (the tunnel caches repeated identical calls).

Two programs are timed:
  1. match-driven filter step (track classification + state management +
     stacked MSCKF/SLAM update + feature init) at reference dimensions
     (M=15 poses, N=15 features, D=150 error state), batched over agents,
     with per-frame track churn (ids rotate: tracks die, new ones appear);
  2. the FULL image pipeline: pyramid build + FAST detection + pyramidal
     LK + RANSAC (Pallas/XLA kernels) + the same fused filter update, on
     480x640 frames rendered along the ATE harness's 6-DoF orbital camera
     motion (scene.orbit_traj: real rotation + z-bobbing, per-agent phase
     offsets) — swept over agent counts.

Prints ONE JSON line:
  {"metric": "ekf_updates_per_s_per_chip", "value": N, "unit": "updates/s",
   "vs_baseline": N, "frames_per_s_per_chip": N, "frames_sweep": {...},
   "batch1_update_latency_ms": N, "rtt_ms": N, ...}

vs_baseline: the reference publishes no numbers (BASELINE.md); its release
builds target real-time on Jetson TX2, i.e. camera-rate (~20-30 Hz) visual
updates with headroom — we take 200 updates/s as a generous C++ per-agent
estimate. The north-star target is vs_baseline >= 10.
"""
import json
import os
import time

import numpy as np

BASELINE_UPDATES_PER_S = 200.0
BASELINE_FRAMES_PER_S = 30.0  # reference camera-rate real-time target


def _enable_compile_cache():
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/xmat_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(x):
    """Force execution: pull a scalar value (block_until_ready is not
    trustworthy through the axon tunnel)."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def measure_rtt():
    """Median round-trip of a tiny dispatch + scalar pull (ms)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    xs = [jnp.full((8, 128), float(i)) for i in range(6)]
    _sync(f(xs[0]))
    ts = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        _sync(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


_SIM_CACHE = {}


def _bench_sim(j: int, n_frames: int):
    """Shared geometric simulation backing the match-driven bench: a
    circle trajectory observing wall landmarks with stable track ids, so
    MSCKF triangulation/baseline/chi2 gates run on epipolar-consistent
    inputs (VERDICT r3 item 6 — i.i.d. Gaussian points made the asserted
    gate behavior meaningless) while every shape stays fixed."""
    # round the length up so warmup and measurement windows (different
    # n_frames) share ONE sim object (identical trajectory + noise draws)
    n_round = -(-n_frames // 256) * 256
    key = (j, n_round)
    if key not in _SIM_CACHE:
        from x_multi_agent_tpu.utils.sim import make_circle_sim

        _SIM_CACHE[key] = make_circle_sim(
            duration=(n_round + 1) / 10.0, imu_rate=100.0, cam_rate=10.0,
            n_landmarks=60, match_budget=j, pixel_noise=5e-4, seed=7,
        )
    return _SIM_CACHE[key]


SIM_V0 = (1.5 * 1.2, 0.0, 0.0)  # circle-sim initial velocity (r*omega)


def _match_inputs_stacked(params, n_agents, n_steps, rng, frame0=0):
    """(n_steps, A, ...) stacked per-frame inputs drawn from the shared
    geometric sim starting at frame ``frame0`` (consecutive windows
    continue the same trajectory, so warmup + measurement form one
    consistent replay). Per-agent: tiny i.i.d. pixel jitter so the
    dispatch content differs across agents/steps (tunnel-cache hygiene);
    ~3% of matches drop out per frame (track churn)."""
    import jax.numpy as jnp

    from x_multi_agent_tpu.vio import track_manager as tm

    n_imu = 10
    j = params.cfg.tracks.n_matches
    sim = _bench_sim(j, frame0 + n_steps)
    fsl = slice(frame0, frame0 + n_steps)

    # frame f consumes IMU samples (f*10, (f+1)*10]
    idx = (
        np.arange(frame0, frame0 + n_steps)[:, None] * n_imu
        + np.arange(1, n_imu + 1)[None, :]
    )  # (n_steps, 10)
    times = np.broadcast_to(
        sim.imu_t[idx][:, None, :], (n_steps, n_agents, n_imu)
    ).astype(np.float32)
    seqs = np.broadcast_to(
        idx[:, None, :], (n_steps, n_agents, n_imu)
    ).astype(np.int32)
    w = sim.imu_w[idx][:, None].astype(np.float32) + rng.normal(
        size=(n_steps, n_agents, n_imu, 3)
    ).astype(np.float32) * 1e-5
    a = sim.imu_a[idx][:, None].astype(np.float32) + rng.normal(
        size=(n_steps, n_agents, n_imu, 3)
    ).astype(np.float32) * 1e-5

    ids = np.broadcast_to(
        sim.match_id[fsl][:, None, :], (n_steps, n_agents, j)
    )
    valid = (
        sim.match_valid[fsl][:, None, :]
        & (rng.random((n_steps, n_agents, j)) > 0.03)
    )
    jit_px = 1e-4
    prev = sim.match_prev[fsl][:, None].astype(np.float32) + rng.normal(
        size=(n_steps, n_agents, j, 2)
    ).astype(np.float32) * jit_px
    cur = sim.match_cur[fsl][:, None].astype(np.float32) + rng.normal(
        size=(n_steps, n_agents, j, 2)
    ).astype(np.float32) * jit_px
    matches = tm.Matches.of(
        track_id=jnp.asarray(np.ascontiguousarray(ids)),
        prev_pt=jnp.asarray(prev),
        cur_pt=jnp.asarray(cur),
        valid=jnp.asarray(valid),
    )
    return (
        jnp.asarray(times),
        jnp.asarray(seqs),
        jnp.asarray(w),
        jnp.asarray(a),
        jnp.asarray(times[:, :, -1]),
        matches,
    )


def _filter_step(params):
    """One match-driven filter step (per agent)."""
    from x_multi_agent_tpu.ekf import ekf as ekf_mod
    from x_multi_agent_tpu.vio import pipeline

    def one_agent(fs, slots, times, seqs, w, a, meas_time, matches):
        meas = pipeline.FrameMeasurement.from_matches(params.cfg, matches)
        fs = ekf_mod.process_imu_batch_impl(params.ekf_params, fs, times, seqs, w, a)

        def update_fn(core, vision, cov, slots):
            return pipeline.visual_update(params.cfg, core, vision, cov, slots, meas)

        fs, slots, applied = ekf_mod.process_update_aux_impl(
            params.ekf_params, fs, meas_time, update_fn, slots
        )
        return fs, slots, applied

    return one_agent


def bench_matches(params, n_agents, n_steps):
    import jax
    import jax.numpy as jnp

    from x_multi_agent_tpu.vio import vio as vio_mod

    fs, slots = vio_mod.init_at_time(params, 0.0, v=np.asarray(SIM_V0))
    stack = lambda x: jnp.broadcast_to(x, (n_agents,) + x.shape)
    fs = jax.tree.map(stack, fs)
    slots = jax.tree.map(stack, slots)
    rng = np.random.default_rng(0)
    one_agent = _filter_step(params)

    def body(carry, inp):
        fs, slots = carry
        fs, slots, applied = jax.vmap(one_agent)(fs, slots, *inp)
        chk = jnp.sum(applied) + jnp.sum(fs.cov[:, 0, 0])
        return (fs, slots), chk

    run = jax.jit(lambda c, xs: jax.lax.scan(body, c, xs))

    # warmup and measurement are CONSECUTIVE windows of one sim replay
    xs_warm = _match_inputs_stacked(params, n_agents, n_steps, rng)
    xs_meas = _match_inputs_stacked(params, n_agents, n_steps, rng, frame0=n_steps)
    carry, chks = run((fs, slots), xs_warm)
    _sync(chks)
    t0 = time.perf_counter()
    carry, chks = run(carry, xs_meas)
    _sync(chks)
    elapsed = time.perf_counter() - t0
    fs1 = carry[0]
    assert bool(jnp.isfinite(fs1.cov).all()), "filter covariance not finite"
    # gate-health asserts (sim-driven inputs make these meaningful):
    # every update applied, SLAM landmarks initialized, trajectory tracked
    from x_multi_agent_tpu.ekf import ekf as ekf_mod

    n_app = float(chks[-1]) - float(jnp.sum(fs1.cov[:, 0, 0]))
    assert n_app >= 0.95 * n_agents, (
        f"only {n_app:.0f}/{n_agents} updates applied in the last step"
    )
    assert int(jnp.min(fs1.vision.n_valid_features)) > 0, (
        "no SLAM features initialized under sim-driven load"
    )
    sim = _bench_sim(params.cfg.tracks.n_matches, 2 * n_steps)
    tail_p = jax.vmap(ekf_mod.tail_core)(fs1).p
    err = float(
        jnp.max(jnp.linalg.norm(tail_p - sim.cam_p[2 * n_steps - 1], axis=-1))
    )
    assert err < 1.0, f"filter lost the sim trajectory (max err {err:.2f} m)"
    return n_agents * n_steps / elapsed


def bench_batch1_latency(params, n_steps=100):
    """Single-agent per-update device latency (scan-amortized; the tunnel
    round-trip is reported separately as rtt_ms)."""
    import jax
    import jax.numpy as jnp

    from x_multi_agent_tpu.vio import vio as vio_mod

    fs, slots = vio_mod.init_at_time(params, 0.0, v=np.asarray(SIM_V0))
    rng = np.random.default_rng(0)
    one_agent = _filter_step(params)

    def body(carry, inp):
        fs, slots = carry
        fs, slots, applied = jax.vmap(one_agent)(fs, slots, *inp)
        return (fs, slots), jnp.sum(applied)

    run = jax.jit(lambda c, xs: jax.lax.scan(body, c, xs))
    stack1 = lambda x: jnp.broadcast_to(x, (1,) + x.shape)
    carry = (jax.tree.map(stack1, fs), jax.tree.map(stack1, slots))
    xs_warm = _match_inputs_stacked(params, 1, n_steps, rng)
    xs_meas = _match_inputs_stacked(params, 1, n_steps, rng, frame0=n_steps)
    carry, chks = run(carry, xs_warm)
    _sync(chks)
    t0 = time.perf_counter()
    carry, chks = run(carry, xs_meas)
    _sync(chks)
    return (time.perf_counter() - t0) / n_steps * 1e3  # ms


def _orbit_frames(n_agents, n_frames, h, w, fx):
    """(n_frames, A, h, w) frames along the 6-DoF orbit + per-agent IMU
    streams, all rendered/staged on device."""
    import jax
    import jax.numpy as jnp

    from x_multi_agent_tpu.utils import scene

    cam_rate, imu_rate = 20.0, 200.0
    tex = jnp.asarray(scene.make_texture(0, size=2048).astype(np.float32))
    trajs = [
        scene.orbit_traj(
            duration=(n_frames + 1) / cam_rate, imu_rate=imu_rate,
            cam_rate=cam_rate, radius=1.5, omega=0.6,
            phase=2.0 * np.pi * i / max(n_agents, 1),
            yaw_amp=0.15, pitch_amp=0.10, roll_amp=0.08, z_amp=0.3, seed=i,
        )
        for i in range(n_agents)
    ]
    p_all = np.stack([t_["cam_p"][:n_frames] for t_ in trajs], axis=1)
    r_all = np.stack([t_["cam_rot"][:n_frames] for t_ in trajs], axis=1)

    # render frame-by-frame: one fused (n_frames, A, H, W) gather program
    # overwhelms the remote compile helper at large A x n_frames
    render = jax.jit(
        lambda p, r: scene.render_wall_frames_jax(tex, p, r, h, w, fx, fx)
    )
    frames = jnp.stack([
        render(jnp.asarray(p_all[k], jnp.float32), jnp.asarray(r_all[k], jnp.float32))
        for k in range(n_frames)
    ])

    imu_per_frame = 10
    imu_w = np.stack([t_["imu_w"] for t_ in trajs])  # (A, n_imu, 3)
    imu_a = np.stack([t_["imu_a"] for t_ in trajs])
    imu_t = np.stack([t_["imu_t"] for t_ in trajs])
    idx = (
        np.arange(n_frames)[:, None] * imu_per_frame
        + np.arange(1, imu_per_frame + 1)[None, :]
    )  # (n_frames, 10)
    times = jnp.asarray(imu_t[:, idx].transpose(1, 0, 2), jnp.float32)
    seqs = jnp.asarray(
        np.broadcast_to(idx[:, None, :], (n_frames, n_agents, imu_per_frame)),
        jnp.int32,
    )
    ws = jnp.asarray(imu_w[:, idx].transpose(1, 0, 2, 3), jnp.float32)
    as_ = jnp.asarray(imu_a[:, idx].transpose(1, 0, 2, 3), jnp.float32)
    meas_t = times[:, :, -1]
    return frames, (times, seqs, ws, as_, meas_t)


def bench_image(params, n_agents, n_steps):
    """Full image pipeline: batched tracker (pyramid + gated FAST +
    pyramidal Pallas LK + RANSAC) + fused filter update, 6-DoF orbital
    frames. Frames are pre-rendered (dataset generation, not pipeline)."""
    import jax
    import jax.numpy as jnp

    from x_multi_agent_tpu.vio import vio as vio_mod
    from x_multi_agent_tpu.vision import camera as cam_mod, tracker as trk_mod

    h, w = 480, 640
    j = params.cfg.tracks.n_matches
    tparams = trk_mod.TrackerParams(
        budget=j, fast_threshold=12.0, n_feat_min=max(60, j // 3),
        n_tiles_h=4, n_tiles_w=4, max_feat_per_tile=40,
        block_half_length=12, margin=12, pyramid_depth=2, win_half=10,
        lk_max_level=2, ransac_threshold_px=1.0,
    )
    cam = cam_mod.Camera.from_fractional(0.8, 0.8 * w / h, 0.5, 0.5, 0.0, w, h)

    # warmup scan has the SAME length as the measured scan -> same compiled
    # executable; the measured call pays zero compile time
    n_warm = n_steps
    frames, imu = _orbit_frames(n_agents, n_warm + n_steps, h, w, 0.8 * w)
    _sync(frames[-1])

    fs, slots = vio_mod.init_at_time(params, 0.0)
    stack = lambda x: jnp.broadcast_to(x, (n_agents,) + x.shape)
    fs = jax.tree.map(stack, fs)
    slots = jax.tree.map(stack, slots)
    tstate = trk_mod.TrackerState.zero(tparams, h, w, jnp.float32)
    tstate = jax.tree.map(stack, tstate)
    one_agent = _filter_step(params)

    def body(carry, inp):
        tstate, fs, slots = carry
        imgs, times, seqs, w_, a_, meas_time = inp
        tstate, matches = trk_mod.track_frame_batch(tparams, cam, tstate, imgs)
        fs, slots, applied = jax.vmap(one_agent)(
            fs, slots, times, seqs, w_, a_, meas_time, matches
        )
        chk = jnp.sum(applied) + jnp.sum(tstate.pts[:, 0]) + jnp.sum(fs.cov[:, 0, 0])
        return (tstate, fs, slots), chk

    def run_fn(c, frames, imu):
        return jax.lax.scan(body, c, (frames,) + imu)

    run = jax.jit(run_fn)
    cut = lambda t, lo, hi: jax.tree.map(lambda x: x[lo:hi], t)
    carry, chks = run(
        (tstate, fs, slots), frames[:n_warm], cut(imu, 0, n_warm)
    )
    _sync(chks)
    t0 = time.perf_counter()
    carry2, chks = run(
        carry, frames[n_warm : n_warm + n_steps], cut(imu, n_warm, n_warm + n_steps)
    )
    _sync(chks)
    elapsed = time.perf_counter() - t0
    tstate, fs, slots = carry2
    n_live = int(jnp.sum(tstate.ids >= 0))
    assert n_live >= n_agents * 10, f"tracker degenerate: {n_live} live features"
    assert bool(jnp.isfinite(fs.cov).all()), "filter covariance not finite"
    fps = n_agents * n_steps / elapsed
    assert fps < 50_000, f"implausible frame rate {fps:.0f}/s - timing artifact"
    return fps


def main():
    import jax

    _enable_compile_cache()

    import __graft_entry__ as ge

    params = ge._params(small=False)
    n_agents = int(os.environ.get("BENCH_AGENTS", "512"))
    n_steps = int(os.environ.get("BENCH_ITERS", "20"))
    img_sweep = [
        int(x)
        for x in os.environ.get("BENCH_IMG_AGENTS", "16,32,64").split(",")
    ]
    img_steps = int(os.environ.get("BENCH_IMG_ITERS", "20"))

    def retry(fn, *args, tries=3):
        # the tunnel's remote-compile endpoint fails transiently (HTTP
        # 500 / truncated body); back off and retry before giving up
        for i in range(tries):
            try:
                return fn(*args)
            except Exception as e:  # noqa: BLE001
                if i == tries - 1:
                    raise
                print(f"# retry {fn.__name__} after: {e}", flush=True)
                time.sleep(20.0 * (i + 1))

    rtt_ms = measure_rtt()
    updates_per_s = retry(bench_matches, params, n_agents, n_steps)
    # per-agent update rate at the fleet sizes the scaling story quotes
    # (BASELINE.md north star is PER-AGENT throughput; vs_baseline below
    # is explicitly chip-aggregate)
    agents_points = {}
    for a_pt in (128,):
        try:
            ups_a = retry(bench_matches, params, a_pt, n_steps)
            agents_points[str(a_pt)] = round(ups_a / a_pt, 1)
        except Exception as e:  # noqa: BLE001
            print(f"# per-agent point at {a_pt} failed: {e}", flush=True)
    agents_points[str(n_agents)] = round(updates_per_s / n_agents, 1)
    lat_ms = retry(bench_batch1_latency, params)
    agents_points["1"] = round(1e3 / lat_ms, 1)
    sweep = {}
    for a in img_sweep:
        try:
            sweep[str(a)] = round(retry(bench_image, params, a, img_steps), 1)
        except Exception as e:  # noqa: BLE001
            print(f"# image sweep at {a} agents failed: {e}", flush=True)
    if not sweep:
        sweep = {"0": 0.0}
    frames_per_s = max(sweep.values())
    best_agents = max(sweep, key=lambda k: sweep[k])

    print(
        json.dumps(
            {
                "metric": "ekf_updates_per_s_per_chip",
                "value": round(updates_per_s, 1),
                "unit": "updates/s",
                # chip-aggregate vs a single-agent 200 Hz C++ estimate —
                # NOT a per-agent ratio; see updates_per_s_per_agent
                "vs_baseline": round(updates_per_s / BASELINE_UPDATES_PER_S, 2),
                "vs_baseline_basis": "chip_aggregate_vs_single_agent_200hz",
                "updates_per_s_per_agent": agents_points,
                "frames_per_s_per_chip": frames_per_s,
                "frames_vs_baseline": round(frames_per_s / BASELINE_FRAMES_PER_S, 2),
                "frames_sweep": sweep,
                "frames_per_s_per_agent_best": round(
                    frames_per_s / int(best_agents), 2
                ),
                "img_agents": int(best_agents),
                "img_resolution": "480x640",
                "img_motion": "orbit_6dof",
                "batch1_update_latency_ms": round(lat_ms, 3),
                "rtt_ms": round(rtt_ms, 2),
                "timing": "lax.scan K-step single-dispatch, scalar-pull sync",
                "agents": n_agents,
            }
        )
    )


if __name__ == "__main__":
    main()
