"""Scaling sweep: EKF visual-update throughput vs agent count on one chip,
plus the virtual multi-chip (shard_map) path.

Produces SCALING.md (BASELINE.md asks for frames/s and updates/s/chip at
1 chip / 1 host / N hosts with agent count swept; multi-host hardware is
not available here, so N>1 chips are exercised via the
xla_force_host_platform_device_count mesh in tests/dryrun).
"""
import json
import os
import subprocess
import sys

AGENTS = [1, 8, 32, 128, 256, 512]

rows = []
for a in AGENTS:
    env = dict(os.environ, BENCH_AGENTS=str(a), BENCH_ITERS="20")
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        timeout=3000,
    )
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    rows.append((a, d["value"]))
    print(a, d["value"], flush=True)

with open("SCALING.md", "w") as f:
    f.write("# Scaling report (one TPU v5e chip)\n\n")
    f.write("Full per-frame pipeline (10 IMU samples + visual update), "
            "M=N=15, f32.\n\n")
    f.write("| agents | updates/s/chip | updates/s/agent |\n|---|---|---|\n")
    for a, v in rows:
        f.write(f"| {a} | {v:.1f} | {v / a:.1f} |\n")
    f.write("\nMulti-chip execution is validated via the agents-sharded "
            "shard_map path (`__graft_entry__.dryrun_multichip`) on a "
            "virtual device mesh; real multi-chip hardware was not "
            "available this round.\n")
print("wrote SCALING.md")
