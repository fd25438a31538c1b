from mono_slam_framework_tpu.viz.match_image import render_match_image
from mono_slam_framework_tpu.viz.map_drawer import MapDrawer

__all__ = ["render_match_image", "MapDrawer"]
