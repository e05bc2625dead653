"""Lightweight stage timing + profiling hooks.

Counterpart of the reference's WallTimer instrumentation (per-scale and
per-Newton-step build/solve times, CG iteration counts — SURVEY.md
section 5, reference `lib/depth_optimizer.cc:306-316`), plus an optional
`jax.profiler` trace for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulates wall-clock per named stage; prints a report.

    ``sync_arrays=True`` makes `sync()` block on device results so stage
    boundaries are accurate. Default off: with async dispatch each device
    round-trip costs real latency (tens of ms through a tunneled chip), so
    production runs let stages overlap and only the end-to-end time is
    meaningful.
    """

    def __init__(self, sync_arrays: bool = False):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.sync_arrays = sync_arrays

    def sync(self, x):
        if self.sync_arrays and x is not None:
            x.block_until_ready()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def add(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage timings:"]
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t = self.totals[name]
            c = self.counts[name]
            lines.append(f"  {name:<28s} {t:8.2f}s  ({c} calls, "
                         f"{t / max(c, 1) * 1000:7.1f} ms avg)")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """Capture a jax.profiler trace when log_dir is set (else no-op)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


GLOBAL_TIMER = StageTimer()
