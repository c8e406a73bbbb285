"""Per-stage wall-clock timing report (reference TIMING flag equivalent,
SURVEY §5.1: clock() pairs around tracker/calibration/PR stages).

Use as a context manager around host-level stages; device work is
block_until_ready'd so timings are real. Enable with
``Timing.enabled = True`` (the reference's compile-time TIMING flag becomes
this runtime switch).
"""
from __future__ import annotations

import collections
import time
from typing import Dict

import jax


class Timing:
    enabled: bool = False
    _acc: Dict[str, float] = collections.defaultdict(float)
    _cnt: Dict[str, int] = collections.defaultdict(int)

    def __init__(self, name: str, sync=None):
        self.name = name
        self.sync = sync

    def __enter__(self):
        if Timing.enabled:
            self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if Timing.enabled:
            if self.sync is not None:
                jax.block_until_ready(self.sync)
            dt = time.perf_counter() - self.t0
            Timing._acc[self.name] += dt
            Timing._cnt[self.name] += 1
        return False

    @classmethod
    def report(cls) -> str:
        lines = ["stage                          total_ms   calls   ms/call"]
        for k in sorted(cls._acc):
            tot = cls._acc[k] * 1e3
            n = cls._cnt[k]
            lines.append(f"{k:30s} {tot:9.2f} {n:7d} {tot / max(n, 1):9.3f}")
        return "\n".join(lines)

    @classmethod
    def reset(cls):
        cls._acc.clear()
        cls._cnt.clear()
