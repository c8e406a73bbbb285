"""Multi-host (DCN) scaling demo: agents sharded over a multi-process mesh.

The reference's "distribution" is N VIO processes on separate machines
exchanging payloads over a ROS network (SURVEY §2.9.5 / §5.8). The TPU
design shards agents over a device mesh; on a multi-host pod the agent
axis spans hosts, and the exchange all_gather rides ICI within a host and
DCN across hosts.

Real multi-host TPU hardware is not available in this environment, so
this demo runs the REAL multi-process path on CPU: it spawns N separate
processes (one per "host"), each with K virtual XLA devices, connected
via ``jax.distributed`` (gRPC — the same cross-process transport layering
a DCN run would exercise). The full per-frame step and the collaborative
all_gather+CI round are jitted over the global mesh; the collective
crosses process boundaries exactly as it would cross hosts.

Usage:
  python scripts/multihost_demo.py                 # 2 hosts x 4 devices
  python scripts/multihost_demo.py --hosts 4 --devices-per-host 2
Prints one JSON line (from host 0) with per-step timing.
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    # NOTE: TOCTOU — the port could be grabbed between close() and the
    # coordinator's bind. SO_REUSEADDR + the retry loop in main() make the
    # launch robust to that race.
    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def worker(args) -> None:
    import jax

    # the axon TPU plugin registers itself from sitecustomize and wins over
    # the JAX_PLATFORMS env var; force the CPU backend the same way
    # tests/conftest.py does
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.hosts,
        process_id=args.process_id,
    )
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from x_multi_agent_tpu.parallel import collab, mesh as pmesh
    from x_multi_agent_tpu.vio import pipeline, track_manager as tm, vio as vio_mod
    from jax.sharding import NamedSharding, PartitionSpec as P

    # one source of truth for the small config (ADVICE r1)
    import __graft_entry__ as ge

    params = ge._params(small=True)
    cfg = params.cfg

    devices = jax.devices()
    mesh = pmesh.make_agent_mesh(devices)
    n_agents = len(devices) * args.agents_per_device
    aspec = NamedSharding(mesh, P("agents"))
    rspec = NamedSharding(mesh, P())

    n_imu = 4
    j = cfg.tracks.n_matches

    # All inputs are built on-device inside jit (deterministic, no host
    # randomness), sharded over the agent axis — no per-process host
    # arrays to stitch into global arrays.
    def build_state():
        fs, slots = vio_mod.init_at_time(params, 0.0)
        stack = lambda x: jnp.broadcast_to(x, (n_agents,) + x.shape)
        return jax.tree.map(stack, fs), jax.tree.map(stack, slots)

    fs, slots = jax.jit(build_state, out_shardings=(aspec, aspec))()

    def build_frame(k):
        t0 = k * n_imu * 0.005
        times = jnp.broadcast_to(
            t0 + (jnp.arange(1, n_imu + 1, dtype=jnp.float32)) * 0.005,
            (n_agents, n_imu),
        )
        seqs = jnp.broadcast_to(
            jnp.arange(n_imu, dtype=jnp.int32) + k * n_imu, (n_agents, n_imu)
        )
        w = jnp.zeros((n_agents, n_imu, 3), jnp.float32)
        a = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 9.81], jnp.float32), (n_agents, n_imu, 3)
        )
        key = jax.random.key(k)
        pts = jax.random.normal(key, (2, n_agents, j, 2), jnp.float32) * 0.2
        matches = tm.Matches.of(
            track_id=jnp.broadcast_to(jnp.arange(j, dtype=jnp.int32), (n_agents, j)),
            prev_pt=pts[0],
            cur_pt=pts[1],
            valid=jnp.ones((n_agents, j), bool),
        )
        meas = jax.vmap(lambda m: pipeline.FrameMeasurement.from_matches(cfg, m))(
            matches
        )
        return times, seqs, w, a, times[:, -1], meas

    shardings = (aspec,) * 6
    frames = [
        jax.jit(build_frame, static_argnums=0, out_shardings=shardings)(k)
        for k in range(args.iters + 1)
    ]

    step = pmesh.sharded_step(params, mesh)
    ccfg = collab.CollabConfig()
    round_fn = pmesh.sharded_collab_round(params, ccfg, mesh)

    # warmup / compile
    fs, slots, applied = step(fs, slots, *frames[0])
    fs, n_matches = round_fn(fs)
    jax.block_until_ready(fs.cov)

    t0 = time.perf_counter()
    for k in range(1, args.iters + 1):
        fs, slots, applied = step(fs, slots, *frames[k])
        fs, n_matches = round_fn(fs)
    jax.block_until_ready(fs.cov)
    elapsed = time.perf_counter() - t0

    # reduce the sharded outputs to replicated scalars (device_get on a
    # cross-process sharded array is not addressable from one process)
    summarize = jax.jit(
        lambda ap, nm: (ap.all(), nm.sum()), out_shardings=(rspec, rspec)
    )
    applied_all, match_sum = jax.device_get(summarize(applied, n_matches))

    if args.process_id == 0:
        per_step_ms = elapsed / args.iters * 1e3
        print(
            json.dumps(
                {
                    "metric": "multihost_step_plus_exchange_ms",
                    "hosts": args.hosts,
                    "devices": len(devices),
                    "agents": n_agents,
                    "value": round(per_step_ms, 2),
                    "unit": "ms/frame (visual update + IMU batch + "
                    "all-gather CI exchange round, all hosts)",
                    "applied": bool(applied_all),
                    "exchange_matches": int(match_sum),
                }
            ),
            flush=True,
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=2)
    ap.add_argument("--devices-per-host", type=int, default=4)
    ap.add_argument("--agents-per-device", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--coordinator", type=str, default="")
    args = ap.parse_args()

    if args.worker:
        worker(args)
        return

    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_host}"
    ).strip()
    # each "host" is a separate OS process; collectives between them run
    # over the jax.distributed gRPC transport. Non-coordinator workers log
    # to /tmp so crashes are diagnosable (ADVICE r1).
    procs = []
    logs = []
    for pid in range(args.hosts):
        if pid == 0:
            stdout, stderr = None, subprocess.STDOUT
            logs.append(None)
        else:
            log = open(f"/tmp/multihost_demo_worker{pid}.log", "w")
            stdout, stderr = log, subprocess.STDOUT
            logs.append(log)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__), "--worker",
                    "--hosts", str(args.hosts),
                    "--devices-per-host", str(args.devices_per_host),
                    "--agents-per-device", str(args.agents_per_device),
                    "--iters", str(args.iters),
                    "--process-id", str(pid),
                    "--coordinator", coordinator,
                ],
                env=env,
                stdout=stdout,
                stderr=stderr,
            )
        )
    rc = 0
    for pid, p in enumerate(procs):
        wrc = p.wait()
        if logs[pid] is not None:
            logs[pid].close()
        if wrc != 0:
            print(
                f"worker {pid} exited with {wrc}"
                + (f" (log: /tmp/multihost_demo_worker{pid}.log)" if pid else ""),
                file=sys.stderr,
            )
            rc = 1
    sys.exit(rc)


if __name__ == "__main__":
    main()
