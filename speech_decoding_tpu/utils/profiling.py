"""Profiling / tracing hooks.

The reference has no profiling at all (only tqdm bars; SURVEY §5). Here:
``trace(dir)`` context manager wraps ``jax.profiler`` (TensorBoard-viewable
traces of XLA ops, transfers, host callbacks), and ``StepTimer`` produces the
step-time / segments-per-second counters reported by the Trainer and bench.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timer with throughput summary."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, items: int = 1) -> float:
        assert self._t0 is not None
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self._items = items
        return dt

    def summary(self, items_per_step: int = 1) -> Dict[str, float]:
        if not self.times:
            return {}
        import numpy as np

        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_step_s": float(arr.mean()),
            "p50_step_s": float(np.percentile(arr, 50)),
            "p95_step_s": float(np.percentile(arr, 95)),
            "items_per_sec": float(items_per_step * len(arr) / arr.sum()),
        }
