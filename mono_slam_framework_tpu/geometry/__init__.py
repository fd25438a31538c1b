from mono_slam_framework_tpu.geometry import se3, projection, triangulation, epipolar

__all__ = ["se3", "projection", "triangulation", "epipolar"]
