from mono_slam_framework_tpu.parallel.ba_sharded import (
    global_bundle_adjust_sharded,
    make_ba_mesh,
)
from mono_slam_framework_tpu.parallel.loftr_tp import loftr_tp_confidence
from mono_slam_framework_tpu.parallel.server import SlamServer
from mono_slam_framework_tpu.parallel.sweep import (
    make_mesh,
    sharded_loftr_sweep,
    sharded_matcher_sweep,
    sharded_tracking_step,
)

__all__ = [
    "global_bundle_adjust_sharded",
    "make_ba_mesh",
    "loftr_tp_confidence",
    "SlamServer",
    "make_mesh",
    "sharded_loftr_sweep",
    "sharded_matcher_sweep",
    "sharded_tracking_step",
]
