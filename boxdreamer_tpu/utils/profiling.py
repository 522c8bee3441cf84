"""Profiling and tracing.

The reference exposes only Lightning's `profiler: "simple"` wall-time
summary and a wall-clock FPS window in the demo (SURVEY.md §5). The TPU
build offers more: a jax.profiler trace context (viewable in XProf/
TensorBoard), a per-step timer with device synchronization for honest
numbers, and an FPS window matching the demo's 10-frame measurement
(reference demo.py:1500-1512).
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Optional

import jax

from boxdreamer_tpu.utils.log import INFO


@contextlib.contextmanager
def trace(logdir: str = "/tmp/boxdreamer_trace"):
    """Capture a device trace for XProf/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        INFO(f"profiler trace written to {logdir}")


class StepTimer:
    """Per-phase wall-time accumulator with block_until_ready around device
    work (the Lightning 'simple' profiler equivalent, honest on TPU)."""

    def __init__(self):
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - t0
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
        lines = ["phase                 total(s)   count   mean(ms)"]
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:<20} {s['total_s']:9.3f} {s['count']:7d} {s['mean_ms']:10.3f}"
            )
        return "\n".join(lines)


class FPSMeter:
    """Sliding-window FPS (reference demo.py:1500-1512 uses a 10-frame
    window)."""

    def __init__(self, window: int = 10):
        self.times = collections.deque(maxlen=window + 1)

    def tick(self) -> Optional[float]:
        self.times.append(time.perf_counter())
        if len(self.times) < 2:
            return None
        dt = self.times[-1] - self.times[0]
        return (len(self.times) - 1) / dt if dt > 0 else None
