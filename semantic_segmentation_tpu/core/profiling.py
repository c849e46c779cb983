"""Tracing/profiling hooks — a capability the reference lacks entirely
(SURVEY.md §5: wall-clock prints only, unused ``--throughput`` flag).

- ``trace(dir)``: context manager around ``jax.profiler`` producing
  TensorBoard/XProf traces of the jitted steps.
- ``StepTimer``: host-side rolling step timing with compile-step exclusion.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput meter; the first ``skip`` steps (compilation) are
    excluded from statistics."""

    def __init__(self, window: int = 50, skip: int = 2):
        self._times: deque[float] = deque(maxlen=window)
        self._skip = skip
        self._last = None
        self._count = 0

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self._skip:
                self._times.append(now - self._last)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    @property
    def mean_step_ms(self) -> float:
        if not self._times:
            return 0.0
        return 1000.0 * sum(self._times) / len(self._times)
