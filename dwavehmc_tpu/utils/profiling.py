"""Profiling & timing hooks.

The reference's only tracing is wall-clock spans printed to the log
(src/Simulation.jl:102,132,139,230) plus @btime microbenchmarks.  Here:
per-phase wall timing plus optional full ``jax.profiler`` device traces
(TensorBoard format) around any phase.
"""

from __future__ import annotations

import contextlib
import time


class PhaseTimer:
    """Accumulates named wall-clock spans; renders a summary line."""

    def __init__(self):
        self.spans: dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + (
                time.perf_counter() - t0)

    def summary(self) -> str:
        return " ".join(f"{k}={v:.2f}s" for k, v in self.spans.items())


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace if a directory is given, else no-op."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
