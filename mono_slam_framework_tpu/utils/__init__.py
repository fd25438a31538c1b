from mono_slam_framework_tpu.utils.profiling import StageTimer, trace
from mono_slam_framework_tpu.utils.app import AsyncSlamDriver, GammaCorrector

__all__ = ["StageTimer", "trace", "AsyncSlamDriver", "GammaCorrector"]
