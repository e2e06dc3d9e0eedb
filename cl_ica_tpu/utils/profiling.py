"""Profiling helpers: jax.profiler traces + step timing."""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]):
    """Capture a jax.profiler trace (view with TensorBoard / XProf).
    No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall time; call tick() once per step."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_step_seconds(self) -> Optional[float]:
        if not self._times:
            return None
        return sum(self._times) / len(self._times)
