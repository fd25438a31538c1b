from mono_slam_framework_tpu.parallel.sweep import (
    make_mesh,
    sharded_matcher_sweep,
    sharded_tracking_step,
)

__all__ = ["make_mesh", "sharded_matcher_sweep", "sharded_tracking_step"]
