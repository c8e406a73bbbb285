"""Inspect the captured trace: device-side ops with metadata."""
import glob
import gzip
import json
from collections import defaultdict

traces = glob.glob("/tmp/xmat_trace/**/*.trace.json.gz", recursive=True)
with gzip.open(traces[0], "rt") as f:
    data = json.load(f)

evs = data["traceEvents"]
# find pid names
pids = {}
for ev in evs:
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        pids[ev["pid"]] = ev["args"].get("name", "")
print("processes:", pids)

by_name = defaultdict(float)
args_of = {}
cnt = defaultdict(int)
for ev in evs:
    if ev.get("ph") != "X":
        continue
    pname = pids.get(ev.get("pid"), "")
    if "TPU" not in pname and "/device" not in pname.lower():
        continue
    name = ev["name"]
    by_name[name] += ev.get("dur", 0) / 1e3
    cnt[name] += 1
    if name not in args_of and ev.get("args"):
        args_of[name] = ev["args"]

total = sum(by_name.values())
print(f"total device time: {total:.1f} ms over 3 steps")
for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
    a = args_of.get(name, {})
    meta = str(a.get("long_name", a.get("tf_op", "")))[:160]
    print(f"{ms:8.3f} ms x{cnt[name]:5d}  {name[:60]:60s} {meta}")
