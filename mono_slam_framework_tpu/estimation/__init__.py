from mono_slam_framework_tpu.estimation.initializer import Initializer, InitResult

__all__ = ["Initializer", "InitResult"]
