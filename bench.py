"""Benchmark: per-agent EKF visual-update throughput on one chip.

Runs the full fused per-frame program (track classification + state
management + stacked MSCKF/SLAM update + feature init) at reference
dimensions (M=15 poses, N=15 features, D=150 error state), batched over
agents to fill the chip, plus the interleaved IMU propagation batch.

Prints ONE JSON line:
  {"metric": "ekf_updates_per_s_per_chip", "value": N, "unit": "updates/s",
   "vs_baseline": N}

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


def _enable_compile_cache():
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/xmat_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import jax

    _enable_compile_cache()
    import jax.numpy as jnp

    from x_multi_agent_tpu.ekf import ekf as ekf_mod
    from x_multi_agent_tpu.vio import pipeline, vio as vio_mod
    from x_multi_agent_tpu.vio import track_manager as tm
    import __graft_entry__ as ge

    params = ge._params(small=False)
    # default 128: per-chip throughput comes from batching agents (the
    # filter matrices are tiny for a TPU); scaling is ~flat below ~64
    n_agents = int(os.environ.get("BENCH_AGENTS", "128"))
    n_iters = int(os.environ.get("BENCH_ITERS", "20"))
    n_imu = 10  # IMU samples between camera frames (200 Hz IMU / 20 Hz cam)

    fs, slots = vio_mod.init_at_time(params, 0.0)
    stack = lambda x: jnp.broadcast_to(x, (n_agents,) + x.shape)
    fs = jax.tree.map(stack, fs)
    slots = jax.tree.map(stack, slots)

    j = params.cfg.tracks.n_matches
    rng = np.random.default_rng(0)

    def one_agent(fs, slots, times, seqs, w, a, meas_time, meas):
        fs = ekf_mod.process_imu_batch_impl(params.ekf_params, fs, times, seqs, w, a)

        def update_fn(core, vision, cov, slots):
            return pipeline.visual_update(params.cfg, core, vision, cov, slots, meas)

        fs, slots, applied = ekf_mod.process_update_aux_impl(
            params.ekf_params, fs, meas_time, update_fn, slots
        )
        return fs, slots, applied

    step = jax.jit(jax.vmap(one_agent))

    def frame_inputs(k):
        t0 = k * n_imu * 0.005
        times = jnp.asarray(
            np.broadcast_to(t0 + np.arange(1, n_imu + 1) * 0.005, (n_agents, n_imu)),
            jnp.float32,
        )
        seqs = jnp.broadcast_to(
            jnp.arange(n_imu, dtype=jnp.int32) + k * n_imu, (n_agents, n_imu)
        )
        w = jnp.zeros((n_agents, n_imu, 3), jnp.float32)
        a = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 9.81], jnp.float32), (n_agents, n_imu, 3)
        )
        matches = tm.Matches.of(
            track_id=jnp.broadcast_to(jnp.arange(j, dtype=jnp.int32), (n_agents, j)),
            prev_pt=jnp.asarray(rng.normal(size=(n_agents, j, 2)) * 0.2, jnp.float32),
            cur_pt=jnp.asarray(rng.normal(size=(n_agents, j, 2)) * 0.2, jnp.float32),
            valid=jnp.ones((n_agents, j), bool),
        )
        meas = jax.vmap(
            lambda m: pipeline.FrameMeasurement.from_matches(params.cfg, m)
        )(matches)
        return times, seqs, w, a, times[:, -1], meas

    # pregenerate all inputs on device so the timing loop measures the
    # device program, not host-side data generation
    inputs = [jax.tree.map(jnp.asarray, frame_inputs(k)) for k in range(n_iters + 1)]

    # warmup / compile
    fs, slots, _ = step(fs, slots, *inputs[0])
    jax.block_until_ready(fs.cov)

    t0 = time.perf_counter()
    for k in range(1, n_iters + 1):
        fs, slots, _ = step(fs, slots, *inputs[k])
    jax.block_until_ready(fs.cov)
    elapsed = time.perf_counter() - t0

    updates_per_s = n_agents * n_iters / elapsed
    print(
        json.dumps(
            {
                "metric": "ekf_updates_per_s_per_chip",
                "value": round(updates_per_s, 1),
                "unit": "updates/s",
                "vs_baseline": round(updates_per_s / BASELINE_UPDATES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
