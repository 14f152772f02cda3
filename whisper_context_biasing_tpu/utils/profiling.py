"""Profiling and throughput accounting.

The reference has no tracing at all (SURVEY.md §5). This module provides:

  * ``profile_trace(dir)`` — context manager around ``jax.profiler`` traces
    (viewable in TensorBoard / Perfetto)
  * ``StepTimer`` — wall-clock accounting with warmup skip
  * ``RtfMeter`` — the north-star metric: processed audio seconds per
    wall second (real-time factor per chip)
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._seen = 0
        self._t = None

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")


class RtfMeter:
    """Accumulates (audio seconds, wall seconds) -> real-time factor."""

    def __init__(self):
        self.audio_s = 0.0
        self.wall_s = 0.0

    def add(self, audio_seconds: float, wall_seconds: float) -> None:
        self.audio_s += audio_seconds
        self.wall_s += wall_seconds

    @property
    def rtf(self) -> float:
        return self.audio_s / self.wall_s if self.wall_s > 0 else float("nan")

    @contextlib.contextmanager
    def timed(self, audio_seconds: float):
        t0 = time.perf_counter()
        yield
        self.add(audio_seconds, time.perf_counter() - t0)
