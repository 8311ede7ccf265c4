"""Per-phase device timing — the analogue of the reference's QPC TIMER macros
around each fracture phase (pch.h:122-141; printed at Surtr.cpp:1917-1941).

Phase names match the reference so numbers are comparable:
ApplyFracture / MergeOutOfImpact / HandleConvexIsland / Refitting / Total.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Wall-clock phase timer with block_until_ready fencing.

    Usage:
        t = PhaseTimer()
        with t.phase("ApplyFracture"):
            out = jitted(...)
        t.report()
    """

    def __init__(self):
        self.times = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            for v in holder.values():
                jax.block_until_ready(v)
            self.times[name].append((time.perf_counter() - t0) * 1e3)

    def medians(self):
        import numpy as np

        return {k: float(np.median(v)) for k, v in self.times.items()}

    def report(self) -> str:
        lines = [
            f"{k:<24s} {sum(v)/len(v):8.3f} ms (n={len(v)})"
            for k, v in self.times.items()
        ]
        return "\n".join(lines)


def trace(fn, *args, path: str = "/tmp/surtr_trace"):
    """Capture a profiler trace of one call (jax.profiler)."""
    with jax.profiler.trace(path):
        out = fn(*args)
        jax.block_until_ready(out)
    return out
