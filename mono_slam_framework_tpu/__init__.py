"""mono_slam_framework_tpu — a TPU-native monocular SLAM framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of
Kolkir/mono_slam_framework (an ORB-SLAM2-derived pipeline designed to compare
pluggable feature matchers; see SURVEY.md). Control flow lives on the host;
every hot numeric stage (feature extraction, matching, RANSAC initialization,
EPnP relocalization, Levenberg-Marquardt pose/bundle optimization) is a jitted
fixed-shape device program.
"""

from mono_slam_framework_tpu.params import SlamParameters

__all__ = ["SlamParameters"]
__version__ = "0.1.0"
