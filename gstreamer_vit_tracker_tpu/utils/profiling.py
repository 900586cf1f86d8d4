"""Profiling/tracing hooks.

The reference instruments every phase of its hot loop with Instant::now()
brackets and prints rolling aggregates (SURVEY.md §5 "tracing/profiling:
PRESENT").  TPU equivalent: host-side phase timers (utils.timing) plus
XLA device traces via ``jax.profiler`` for kernel-level views.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating host-side phase timer (the map/view/track/draw
    micro-breakdown of pipeline_ir.rs:126-208 as a reusable utility)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def avg_ms(self, name: str) -> float:
        n = self.counts.get(name, 0)
        return 1000.0 * self.totals.get(name, 0.0) / n if n else 0.0

    def summary(self) -> str:
        return " | ".join(f"{k}:{self.avg_ms(k):.2f}ms"
                          for k in sorted(self.totals))
