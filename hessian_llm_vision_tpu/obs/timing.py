"""Timing / throughput observability.

Reference: per-HVP-iteration timers in ``CurvVecProduct.__call__``
(/root/reference/gpt2_savehessian.py:186-188), per-step timers
(diego_pythia.py:176-191), ``Time/train`` TensorBoard scalar.  The
north-star metric for the rebuild is HVPs/sec/chip (BASELINE.json), so it
gets a first-class meter.  ``jax.profiler`` trace capture wraps the same
API for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class Timer:
    """Accumulating named wall-clock timer.  Use ``block=True`` sections to
    include device work (calls ``block_until_ready`` on the given arrays)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def mean(self, name: str) -> float:
        return self.totals[name] / max(self.counts.get(name, 0), 1)

    def summary(self) -> Dict[str, float]:
        return {k: self.mean(k) for k in self.totals}


class HVPMeter:
    """HVPs/sec counter — the headline throughput number."""

    def __init__(self):
        self.num_hvps = 0
        self.seconds = 0.0

    def record(self, num_hvps: int, seconds: float) -> None:
        self.num_hvps += num_hvps
        self.seconds += seconds

    @property
    def hvps_per_sec(self) -> float:
        return self.num_hvps / self.seconds if self.seconds else 0.0


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
