"""Profiling / step-time metering (aux subsystem — the reference has none,
SURVEY.md §5.1; here: jax.profiler traces plus a lightweight step timer)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/kpf_trace'):
    """Capture a jax.profiler trace (view with TensorBoard or Perfetto)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time / throughput meter."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times: list = []
        self._last: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def mean_step_s(self) -> float:
        return float(np.mean(self.times)) if self.times else float('nan')

    def throughput(self, batch_size: int) -> float:
        m = self.mean_step_s
        return batch_size / m if m and np.isfinite(m) and m > 0 else 0.0
