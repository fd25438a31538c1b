from mono_slam_framework_tpu.matchers.base import FeatureMatcher, MatchFramesResult
from mono_slam_framework_tpu.matchers.orb_matcher import OrbFeatureMatcher

__all__ = [
    "FeatureMatcher",
    "MatchFramesResult",
    "OrbFeatureMatcher",
    "LoftrFeatureMatcher",
]


def __getattr__(name):
    # lazy: importing the DNN matcher pulls in the LoFTR model module, which
    # ORB-only users should not pay for at package-import time
    if name == "LoftrFeatureMatcher":
        from mono_slam_framework_tpu.matchers.loftr_matcher import (
            LoftrFeatureMatcher,
        )

        return LoftrFeatureMatcher
    raise AttributeError(name)
