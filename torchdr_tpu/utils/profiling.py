"""Profiling hooks.

The reference ships no profiling (SURVEY.md §5). Here: a context manager
around ``jax.profiler`` for device traces, plus the per-phase wall-clock
timers already emitted by the verbose logger (utils/logger.log_phase).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/torchdr_tpu_trace"):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulate named phase wall-clock timings (host-side)."""

    def __init__(self):
        self.timings: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def summary(self) -> str:
        total = sum(self.timings.values())
        lines = [f"{k}: {v:.3f}s ({100 * v / total:.0f}%)" for k, v in self.timings.items()]
        return " | ".join(lines)
