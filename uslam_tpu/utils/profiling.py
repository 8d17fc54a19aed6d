"""Profiling / tracing hooks.

The reference has no tracing at all (SURVEY.md §5); closest artifact is the
graph.dot dump. Here: per-stage wall-clock accumulation plus an optional
``jax.profiler`` trace context for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

from uslam_tpu.utils.logging import get_logger

log = get_logger("profiling")


class Profiler:
    """Accumulates wall-clock per named stage; ``summary()`` for metrics."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "calls": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }


@contextlib.contextmanager
def stage_timer(name: str):
    """One-off stage timer that logs at DEBUG."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        log.debug("%s took %.4fs", name, time.perf_counter() - t0)


@contextlib.contextmanager
def device_trace(log_dir: str):  # pragma: no cover - needs real device
    """jax.profiler trace wrapper (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
