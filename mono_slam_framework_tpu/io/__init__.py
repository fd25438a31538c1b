from mono_slam_framework_tpu.io import checkpoint, trajectory

__all__ = ["checkpoint", "trajectory"]
