"""Tracing / profiling surface.

The reference has none beyond vestigial timeit imports (SURVEY.md §5); here
profiling is first-class: `jax.profiler` trace capture around training
windows (viewable in TensorBoard / Perfetto) and a lightweight step timer
that feeds the `[iters] TRAIN | ... [ETA]` console line.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str], enabled: bool = True):
    """Capture a jax profiler trace into `log_dir`/plugins/profile."""
    if not enabled or log_dir is None:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling mean of step wall-clock, with device sync on demand."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is None:
            return
        self.times.append(time.perf_counter() - self._t0)
        if len(self.times) > self.window:
            self.times.pop(0)
        self._t0 = None

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    @property
    def steps_per_sec(self) -> float:
        m = self.mean
        return 1.0 / m if m > 0 else 0.0
