"""Dataset loaders: TUM RGB-D, KITTI odometry, EuRoC MAV.

The reference's only frame source is a live Webots camera (src/main.cpp:
122-128); the rebuild's BASELINE.json configs name TUM fr1/xyz, fr1/desk,
KITTI 00 and EuRoC MH_01, so these loaders provide the standard monocular
frame streams (grayscale f32 [H,W] + timestamp) for offline runs. PIL decodes
images (no OpenCV in this environment).
"""

from __future__ import annotations

import os
from typing import Iterator, NamedTuple

import numpy as np


class FrameData(NamedTuple):
    timestamp: float
    image: np.ndarray  # f32 [H, W] grayscale 0..255


def _load_gray(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), np.float32)


def load_tum(seq_dir: str) -> Iterator[FrameData]:
    """TUM RGB-D monocular stream: rgb.txt lines `timestamp filename`."""
    index = os.path.join(seq_dir, "rgb.txt")
    with open(index) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ts, rel = line.split()[:2]
            yield FrameData(float(ts), _load_gray(os.path.join(seq_dir, rel)))


def load_tum_groundtruth(seq_dir: str):
    """groundtruth.txt -> (times [N], pos [N,3], quat [N,4])."""
    from mono_slam_framework_tpu.io import trajectory

    return trajectory.read_tum(os.path.join(seq_dir, "groundtruth.txt"))


def load_kitti(seq_dir: str, camera: str = "image_0") -> Iterator[FrameData]:
    """KITTI odometry grayscale: times.txt + image_0/######.png."""
    with open(os.path.join(seq_dir, "times.txt")) as f:
        times = [float(x) for x in f.read().split()]
    img_dir = os.path.join(seq_dir, camera)
    names = sorted(os.listdir(img_dir))
    for ts, name in zip(times, names):
        yield FrameData(ts, _load_gray(os.path.join(img_dir, name)))


def load_euroc(seq_dir: str, cam: str = "cam0") -> Iterator[FrameData]:
    """EuRoC MAV: mav0/cam0/data.csv (ns timestamps) + data/*.png."""
    cam_dir = os.path.join(seq_dir, "mav0", cam)
    with open(os.path.join(cam_dir, "data.csv")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ts_ns, name = line.split(",")[:2]
            yield FrameData(
                float(ts_ns) * 1e-9,
                _load_gray(os.path.join(cam_dir, "data", name.strip())),
            )


LOADERS = {"tum": load_tum, "kitti": load_kitti, "euroc": load_euroc}
