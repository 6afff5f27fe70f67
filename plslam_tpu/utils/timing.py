"""Per-stage wall-clock profiling.

Reference parity: stvo-pl ``src/timer.cpp`` (chrono scoped timer + the
per-stage millisecond prints in the frame loop). Keeps the reference's
stage taxonomy (detect / match / opt / LBA / loop) so timing breakdowns
are comparable. Device work is asynchronous, so stop() blocks on the
provided arrays before reading the clock.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class StageTimer:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._t0: Dict[str, float] = {}

    def start(self, stage: str) -> None:
        if self.enabled:
            self._t0[stage] = time.perf_counter()

    def stop(self, stage: str, *block_on) -> float:
        if not self.enabled:
            return 0.0
        for x in block_on:
            jax.block_until_ready(x)
        dt = time.perf_counter() - self._t0[stage]
        self.totals[stage] += dt
        self.counts[stage] += 1
        return dt

    def summary(self) -> Dict[str, float]:
        """Mean milliseconds per stage."""
        return {k: 1e3 * self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.2f}ms" for k, v in self.summary().items())


@contextlib.contextmanager
def maybe_profile(trace_dir):
    """jax.profiler device trace when a directory is given, no-op
    otherwise (SURVEY.md §5 tracing parity: Timer prints + a real
    profiler; view traces with tensorboard/xprof)."""
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield
