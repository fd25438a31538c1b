from mono_slam_framework_tpu.ops import filters, fast, orb, hamming

__all__ = ["filters", "fast", "orb", "hamming"]
