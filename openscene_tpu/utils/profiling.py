"""Profiling: jax.profiler traces + the data/compute split meters.

The reference's only perf observability is wall-clock data/batch meters with
an ETA line (run/distill.py:299-365, util/util.py:86-102) — kept in
utils.train_utils.AverageMeter.  This adds TPU-native tracing:

    with trace("out/profile"):
        train_step(...)

then load the trace directory in TensorBoard / xprof.  ``StepTimer`` gives
per-phase wall breakdown with a one-line report.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labeling regions inside a trace."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulate named phase durations (host wall clock)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def report(self) -> str:
        parts = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            parts.append(f"{name} {total:.2f}s ({total / max(n, 1):.3f}s x{n})")
        return " | ".join(parts)

    def reset(self):
        self.totals.clear()
        self.counts.clear()
