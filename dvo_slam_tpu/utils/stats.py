"""Profiling and observability utilities.

TPU-native equivalent of the reference's tracing subsystem (SURVEY.md §6):
dvo_core/include/dvo/util/stopwatch.h (stopwatch / stopwatch_collection —
static per-section timers around the dense-tracking loop) and the
per-frame Stats structs of DenseTracker::Result.

Device timing respects async dispatch: sections block_until_ready their
outputs, so a section measures real device latency, not dispatch time. For
kernel-level profiles use `trace(...)` (jax.profiler) and inspect with
TensorBoard/xprof.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax
import numpy as np


class Stopwatch:
    """Named section timers (reference stopwatch_collection).

    with watch.section("track"):
        res = track(...)           # block handled by the context exit
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, block_on: Any = None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - start
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1000.0 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:30s} {s['count']:6d} x {s['mean_ms']:9.3f} ms "
                f"= {s['total_s']:8.3f} s"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (xprof/TensorBoard readable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameLogger:
    """Structured per-frame jsonl logging (reference ROS_INFO + Stats).

    Each record carries the tracking statistics the reference exposes via
    DenseTracker::Result::Statistics and the SLAM events (keyframe
    switches, loop closures).
    """

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = open(path, "w") if path else None
        self.records = []

    def log(self, **fields):
        rec = {
            k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in fields.items()
        }
        self.records.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
