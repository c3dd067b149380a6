"""Tracing / profiling utilities.

The reference prints per-node wall-clock stats (heading node 5 s stats,
``heading_estimation_node.cpp:140-199``; IMU driver rates,
``imu_modbus_node.cpp:31-34``); here scans/sec and ms/stage are first-class:

* :class:`RateTracker` — rolling-window rate + latency stats with periodic
  report lines (the 5-second stat prints);
* :class:`StageTimer` — per-stage wall timers with device sync;
* :func:`trace` — context manager around ``jax.profiler`` for xprof traces.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Optional

import jax


class RateTracker:
    def __init__(self, name: str = "", window: int = 100,
                 report_every_s: float = 5.0, printer=print):
        self.name = name
        self.stamps = collections.deque(maxlen=window)
        self.latencies = collections.deque(maxlen=window)
        self.report_every = report_every_s
        self._last_report = time.perf_counter()
        self._printer = printer

    def tick(self, latency_s: Optional[float] = None):
        now = time.perf_counter()
        self.stamps.append(now)
        if latency_s is not None:
            self.latencies.append(latency_s)
        if now - self._last_report >= self.report_every:
            self._last_report = now
            self._printer(self.report())

    @property
    def rate_hz(self) -> float:
        if len(self.stamps) < 2:
            return 0.0
        dt = self.stamps[-1] - self.stamps[0]
        return (len(self.stamps) - 1) / dt if dt > 0 else 0.0

    @property
    def mean_latency_ms(self) -> float:
        if not self.latencies:
            return 0.0
        return 1000.0 * sum(self.latencies) / len(self.latencies)

    def report(self) -> str:
        return (f"[{self.name}] {self.rate_hz:.2f} Hz, "
                f"latency {self.mean_latency_ms:.1f} ms "
                f"(n={len(self.stamps)})")


class StageTimer:
    """Accumulates wall time per named stage; blocks on device results so the
    numbers mean something under async dispatch."""

    def __init__(self):
        self.totals: dict[str, float] = collections.defaultdict(float)
        self.counts: dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> dict:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_ms": 1000.0 * self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }


@contextlib.contextmanager
def trace(logdir: str):
    """xprof trace around a region: view with tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
