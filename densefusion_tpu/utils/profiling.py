"""Profiling hooks: per-step wall-clock timing and jax.profiler traces.

The reference has no tracing at all (SURVEY.md §5.1); here step timing is a
first-class metric and any region can be captured for TensorBoard/XProf via
``trace_context``.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class StepTimer:
    """Tracks step wall-clock times; report median/p90 & throughput."""

    def __init__(self, items_per_step: int = 1):
        self.items_per_step = items_per_step
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    def summary(self, skip_warmup: int = 1) -> dict:
        t = np.asarray(self.times[skip_warmup:] or self.times)
        med = float(np.median(t))
        return {
            "steps": len(t),
            "median_s": med,
            "p90_s": float(np.percentile(t, 90)),
            "items_per_s": self.items_per_step / med if med > 0 else 0.0,
        }


@contextlib.contextmanager
def trace_context(log_dir: str | None):
    """jax.profiler trace region; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
