from mono_slam_framework_tpu.optim.pose_opt import pose_optimize
from mono_slam_framework_tpu.optim.bundle_adjust import (
    BAProblem,
    build_problem,
    bundle_adjust,
    global_bundle_adjust,
    local_bundle_adjust,
)

__all__ = [
    "pose_optimize",
    "BAProblem",
    "build_problem",
    "bundle_adjust",
    "global_bundle_adjust",
    "local_bundle_adjust",
]
