"""Wall-clock timer (reference `lib/utils/timer.py:2-21`) plus jax.profiler
hooks the reference never had."""

from __future__ import annotations

import contextlib
import time


class Timer:
    def __init__(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0

    def tic(self):
        self.start_time = time.time()

    def toc(self, average: bool = True) -> float:
        self.diff = time.time() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace around a code block (view in xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
