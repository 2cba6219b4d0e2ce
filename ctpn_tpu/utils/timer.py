"""Timing utilities.

Fills the role of the reference's wall-clock accumulator
(`lib/utils/timer.py:2-21`) with a context-manager stopwatch, and adds
jax.profiler trace hooks the reference never had.
"""

from __future__ import annotations

import contextlib
import math
import time


class Stopwatch:
    """Accumulating wall-clock stopwatch.

    Wrap each timed section in a ``with`` block; per-lap and aggregate
    timings are exposed as properties::

        sw = Stopwatch()
        for batch in loader:
            with sw:
                step(batch)
        print(sw.mean, sw.last)
    """

    def __init__(self) -> None:
        self.laps: list[float] = []
        self._t0: float | None = None

    def __enter__(self) -> "Stopwatch":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> bool:
        assert self._t0 is not None, "Stopwatch exited without entering"
        self.laps.append(time.perf_counter() - self._t0)
        self._t0 = None
        return False

    @property
    def count(self) -> int:
        return len(self.laps)

    @property
    def last(self) -> float:
        return self.laps[-1] if self.laps else 0.0

    @property
    def total(self) -> float:
        return math.fsum(self.laps)

    @property
    def mean(self) -> float:
        return self.total / len(self.laps) if self.laps else 0.0


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace around a code block (view in xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
