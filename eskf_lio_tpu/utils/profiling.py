"""Profiling / tracing.

The reference hand-rolls `omp_get_wtime()` timers around three pipeline
stages and prints avg/max on exit (`Odometry.cpp:10-14,99-109`; SURVEY.md
§5.1).  Here the same avg/max stage summary exists (`pipeline.odometry.
StageTimer`), plus first-class `jax.profiler` integration for device-level
traces viewable in XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace of everything inside the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler timelines."""
    with jax.profiler.TraceAnnotation(name):
        yield


class Stopwatch:
    """Blocking wall-clock timing of a device computation (forces
    `block_until_ready` so async dispatch doesn't lie)."""

    def __init__(self):
        self.laps: list[float] = []

    @contextlib.contextmanager
    def lap(self, result=None):
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            if "result" in out:
                jax.block_until_ready(out["result"])
            self.laps.append(time.perf_counter() - t0)

    @property
    def avg(self) -> float:
        return sum(self.laps) / max(len(self.laps), 1)

    @property
    def max(self) -> float:
        return max(self.laps) if self.laps else 0.0

    def summary(self) -> str:
        return (
            f"n={len(self.laps)} avg={self.avg * 1e3:.2f} ms "
            f"max={self.max * 1e3:.2f} ms"
        )
