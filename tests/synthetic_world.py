"""Synthetic textured-plane world for end-to-end pipeline tests.

The implementation moved into the package (`mono_slam_framework_tpu.sim`)
so the interactive teleop driver and bench can share it; this module is a
re-export kept for the existing test imports.
"""

from mono_slam_framework_tpu.sim import (  # noqa: F401
    PlaneWorld,
    lateral_trajectory,
    rect_loop_trajectory,
)
