"""Tracing / profiling helpers (SURVEY §5: the reference only has
wall-clock accumulation, ``duffing.py:916-960``).

- :class:`StepTimer` — the reference's ``t_sum`` pattern done right:
  accumulate named phase wall-times with device synchronization.
- :func:`trace` — context manager around ``jax.profiler`` for XLA-level
  traces viewable in TensorBoard/Perfetto.
- :func:`solves_per_second` — the headline metric helper.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class StepTimer:
    """Accumulates wall time per named phase (device-synchronized)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = True):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                # drain pending device work so the phase owns its time
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }


@contextlib.contextmanager
def trace(logdir: str):
    """XLA-level profiler trace: ``with trace('/tmp/jax-trace'): run()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def solves_per_second(batch: int, steps: int, wall_s: float) -> float:
    return batch * steps / wall_s


def time_jitted(fn, *args, reps: int = 3) -> float:
    """Best-of wall time of a jitted callable (compiles+warms first)."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best
