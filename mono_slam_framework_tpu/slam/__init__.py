from mono_slam_framework_tpu.slam.system import System
from mono_slam_framework_tpu.slam.frame import Frame, FrameBase, FrameFactory, KeyPointMap
from mono_slam_framework_tpu.slam.map_model import KeyFrame, KeyFrameFactory, Map, MapPoint
from mono_slam_framework_tpu.slam.kfdb import KeyFrameDatabase, KeyFrameMatchDatabase

__all__ = [
    "System",
    "Frame",
    "FrameBase",
    "FrameFactory",
    "KeyPointMap",
    "KeyFrame",
    "KeyFrameFactory",
    "Map",
    "MapPoint",
    "KeyFrameDatabase",
    "KeyFrameMatchDatabase",
]
