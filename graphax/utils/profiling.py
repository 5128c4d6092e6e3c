"""Profiling & throughput instrumentation (SURVEY §5.1 TPU equivalent:
NFE counters as carried scalars + jax.profiler traces + per-step edges/s)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/graphax-trace", enabled: bool = True):
    """Wrap a region in a jax.profiler trace (viewable with TensorBoard /
    xprof). No-op when disabled or the profiler is unavailable."""
    if not enabled:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class ThroughputMeter:
    """edges/s (or any unit/s) accumulator around solver steps."""

    def __init__(self, units_per_call: float):
        self.units = units_per_call
        self.total_units = 0.0
        self.total_time = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total_time += time.perf_counter() - self._t0
        self.total_units += self.units
        return False

    @property
    def rate(self) -> float:
        return self.total_units / self.total_time if self.total_time else 0.0
