"""Profiling helpers: wall-clock timers (with device sync) and optional
jax.profiler traces (SURVEY.md §5.1)."""
from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["Timer", "trace"]


class Timer:
    """Wall-clock context manager that blocks on device completion.

    ``block_on`` (optional) is a pytree of arrays to block_until_ready on
    exit so asynchronous dispatch does not fake the timing.
    """

    def __init__(self):
        self.elapsed = 0.0
        self._result = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def set_result(self, value):
        """Register arrays to synchronize on before stopping the clock."""
        self._result = value
        return value

    def __exit__(self, *exc):
        if self._result is not None:
            jax.block_until_ready(self._result)
        self.elapsed = time.perf_counter() - self._t0
        return False


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context — view with TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
