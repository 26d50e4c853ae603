"""Profiling / tracing hooks (first-class here; the reference only surfaces
rl_games step timers — SURVEY.md §5).

``trace`` wraps a code region with ``jax.profiler`` trace capture (view in
TensorBoard / XProf); ``StepTimer`` reproduces the play_time/update_time/
step_time breakdown the reference logs (learning/A2CAgent_MA.py:13-36).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a device trace: ``with profiling.trace('runs/trace'): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in device traces (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock phase timers (the step/play/update-time breakdown)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {f"{k}_time_ms": 1e3 * v / max(self.counts[k], 1)
                for k, v in self.totals.items()}
