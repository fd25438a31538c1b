from mono_slam_framework_tpu.matchers.base import FeatureMatcher, MatchFramesResult
from mono_slam_framework_tpu.matchers.orb_matcher import OrbFeatureMatcher

__all__ = ["FeatureMatcher", "MatchFramesResult", "OrbFeatureMatcher"]
