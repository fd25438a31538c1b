from mono_slam_framework_tpu.utils.profiling import StageTimer, trace

__all__ = ["StageTimer", "trace"]
