"""Per-phase wall-clock timing + jax profiler hooks.

Replaces the reference's scattered ``print("encode用时", ...)`` timing
(generation_utils.py:389-413,415-521) with first-class phase timers and an
optional ``jax.profiler`` trace capture for TPU timeline analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase.  Blocks on device results so
    the measured span covers actual device execution."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict[str, float]:
        out = {}
        for k, total in self.totals.items():
            out[f"{k}_total_s"] = total
            out[f"{k}_mean_ms"] = 1e3 * total / max(self.counts[k], 1)
        return out

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def profile_trace(log_dir: str | None) -> Iterator[None]:
    """Capture a jax profiler trace (view with TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
