"""Stage timing + device profiling hooks.

The reference's only tracing is wall-clock prints around stages
(openMVG Timer, sparseBuilder.cpp:674-1580; SURVEY.md §5).  Here: a
structured stage timer that feeds the report/event bus, plus optional
jax.profiler trace capture around a block (view the output with
TensorBoard / xprof for per-kernel device timelines)."""

from __future__ import annotations

import contextlib
import time


class StageTimers:
    """Accumulates named stage wall-times (seconds)."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.time() - t0

    def report(self) -> dict[str, float]:
        return {k: round(v, 3) for k, v in self.times.items()}


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace around a block when log_dir is set; no-op
    otherwise (bench and pipeline accept a --trace-dir style knob)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
