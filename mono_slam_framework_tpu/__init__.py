"""mono_slam_framework_tpu — a TPU-native monocular SLAM framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of
Kolkir/mono_slam_framework (an ORB-SLAM2-derived pipeline designed to compare
pluggable feature matchers; see SURVEY.md). Control flow lives on the host;
every hot numeric stage (feature extraction, matching, RANSAC initialization,
EPnP relocalization, Levenberg-Marquardt pose/bundle optimization) is a jitted
fixed-shape device program.
"""

import jax as _jax

# TPU matmuls default to single-pass bf16 on f32 inputs; the geometry /
# optimizer math that rides `@`/einsum (pose composition chains, point
# transforms, reprojection Jacobians) silently loses ~16 mantissa bits vs
# the CPU backend — measured on the rect-loop hard world as leg-level
# trajectory wander that no loop correction can remove (tools/
# tpu_axis_probe.py, KNOWN_ISSUES.md round-5). Pin f32 math globally; the
# MXU-critical kernels that tolerate or are exact in bf16 (Hamming binary
# dots, one-hot descriptor sampling, the LoFTR backbone/transformer) pass
# explicit bf16 operands or a local bfloat16 scope, so their fast path is
# unaffected by this default.
_jax.config.update("jax_default_matmul_precision", "highest")

from mono_slam_framework_tpu.params import SlamParameters

__all__ = ["SlamParameters"]
__version__ = "0.1.0"
