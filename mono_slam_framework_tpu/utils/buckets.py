"""Coarse capacity ladders for relay-expensive shape buckets.

Every jitted program keyed by a data-dependent capacity costs a fresh
executable per distinct capacity — ~1.5 s cached-load (minutes uncached)
through the relay-attached TPU, paid at the first keyframe event that
reaches each new bucket (KNOWN_ISSUES.md relay envelope). Plain pow2
bucketing makes early mapping walk MANY buckets (64, 128, 256, ... per
dimension, multiplied across dimensions).

`ladder_cap` replaces pow2 with a floor + factor-4 ladder: the first rung
covers the whole early run, and each dimension has only ~2-3 reachable
rungs, so (a) far fewer executables exist at all and (b) the NEXT rung per
dimension is exactly predictable — utils/prewarm.py warms it in the
background long before the map grows into it (VERDICT r3 #2).
"""

from __future__ import annotations

# rung-0 ladder floors of every keyframe-event device path. Shared here so
# slam/device_io.prewarm_startup_shapes can background-warm exactly the
# executables the first keyframe events will dispatch.
LBA_FLOORS = {"C": 8, "P": 512, "E": 1024, "Q": 4096}  # local BA capacities
TRI_FLOORS = {"B": 4, "m": 256}  # batched-DLT neighbor sweep
MATCH_STACK_FLOOR = 8  # match_against_many stacked-keyframe capacity


def ladder_cap(n: int, floor: int, factor: int = 4) -> int:
    """Smallest floor * factor^k >= max(n, 1)."""
    cap = int(floor)
    n = int(n)
    while cap < n:
        cap *= factor
    return cap
