"""Profiling: jax.profiler traces + host step timers as first-class tools.

The reference only had a disabled Chrome-trace block (dnn.py:525-542); here
tracing is a context manager usable around any training window, plus a
lightweight section timer for host-side pipeline accounting.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard/xprof format) of the block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Accumulates wall time per named section (data/step/eval/...)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {name: {"total_s": self.totals[name], "count": self.counts[name],
                       "mean_ms": 1000.0 * self.totals[name] / max(self.counts[name], 1)}
                for name in self.totals}
