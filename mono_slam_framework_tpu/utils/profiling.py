"""Per-stage timing + optional device profiler traces.

The reference has no tracing/profiling at all (SURVEY.md §5: only wall-clock
frame stamps in main.cpp:123-126). This module provides:

  * StageTimer — named wall-clock accumulators around pipeline stages (the
    jitted stages are named after their reference counterparts so traces are
    attributable);
  * trace() — context manager wrapping jax.profiler for device traces.

Note on timing jitted calls through the axon relay: `block_until_ready` may
return before remote execution completes; force a tiny host readback (e.g.
`float(jnp.sum(x))`) to get honest wall-clock numbers.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "calls": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in sorted(self.totals)
        }

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """Device profiler trace around a code block (view with tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
