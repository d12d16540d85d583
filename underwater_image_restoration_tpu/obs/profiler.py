"""Profiling hooks — absent in the reference (SURVEY.md §5: only coarse
wall-clock epoch timers, ModelTrainer.py:69,128-130).  TPU-native: wrap any
region in a ``jax.profiler`` trace viewable in TensorBoard/Perfetto, plus a
cheap step timer for steps/sec and images/sec.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(profile_dir: str):
    """Trace the enclosed region when profile_dir is non-empty; no-op else."""
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        yield


class StepTimer:
    """Wall-clock per-step timer with warmup exclusion (first step compiles)."""

    def __init__(self, skip_first: int = 1):
        self.skip = skip_first
        self.reset()

    def reset(self):
        self._n = 0
        self._total = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        if self.skip > 0:
            self.skip -= 1
        else:
            self._n += 1
            self._total += dt
        return dt

    @property
    def mean(self) -> float:
        return self._total / max(1, self._n)

    @property
    def count(self) -> int:
        return self._n
