"""LoFTR DNN matcher plugin.

Capability twin of the reference DNNFeatureMatcher
(src/dnnfeaturematcher.{h,cpp}): run the LoFTR_teacher model on two grayscale
frames, threshold the [1200,1200] coarse confidence matrix, and decode cell
pairs to pixel coordinates at 16px resolution — row index = image-1 cell,
col = image-2 cell, x = (cell % 40)*16, y = (cell // 40)*16
(dnnfeaturematcher.cpp:75-100). Default threshold 0.1 (src/main.cpp:63).

TPU adaptation: the model runs as one jitted XLA program (see models/loftr);
selection returns a fixed-capacity top-`max_matches` set by confidence
(the reference returns every cell above threshold; a fixed cap keeps shapes
static — the cap is far above typical above-threshold counts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mono_slam_framework_tpu.matchers.base import FeatureMatcher, MatchFramesResult
from mono_slam_framework_tpu.models.loftr import LoftrModel, execute_graph

MODEL_H, MODEL_W = 480, 640
CELL = 16  # model_resolution (src/main.cpp:64)
GRID_W = MODEL_W // CELL  # 40
GRID_H = MODEL_H // CELL  # 30
L = GRID_W * GRID_H  # 1200


class LoftrFeatureMatcher(FeatureMatcher):
    def __init__(
        self,
        model_path: str = "/root/reference/model/LoFTR_teacher.onnx",
        threshold: float = 0.1,
        max_matches: int = 1024,
    ):
        self.model = LoftrModel(model_path)
        self.threshold = float(threshold)
        self.max_matches = int(max_matches)
        graph = self.model.graph
        host_consts = self.model._host_consts

        @functools.partial(jax.jit, static_argnames=("max_matches",))
        def match_fn(params, img0, img1, threshold, max_matches):
            merged = {**host_consts, **params}
            conf = execute_graph(
                graph, merged, {"img0": img0, "img1": img1}
            )[0][0]  # [L, L]
            flat = conf.reshape(-1)
            if jax.devices()[0].platform == "tpu":
                vals, idx = jax.lax.approx_max_k(flat, max_matches)
            else:
                vals, idx = jax.lax.top_k(flat, max_matches)
            ok = vals > threshold
            cell1 = idx // L
            cell2 = idx - cell1 * L
            x1 = (cell1 % GRID_W) * CELL
            y1 = (cell1 // GRID_W) * CELL
            x2 = (cell2 % GRID_W) * CELL
            y2 = (cell2 // GRID_W) * CELL
            xy1 = jnp.stack([x1, y1], -1).astype(jnp.int32)
            xy2 = jnp.stack([x2, y2], -1).astype(jnp.int32)
            return xy1, xy2, ok, vals

        self._match_fn = match_fn

    def _prep(self, frame):
        img = np.asarray(frame.image, np.float32)
        h, w = img.shape
        self._scale = (w / MODEL_W, h / MODEL_H)
        if (h, w) != (MODEL_H, MODEL_W):
            import jax.image

            img = np.asarray(
                jax.image.resize(jnp.asarray(img), (MODEL_H, MODEL_W), "bilinear")
            )
        return (img / 255.0)[None, None]  # ConvertImageToFloat, cpp:5-9

    def match_frames(self, frame1, frame2) -> MatchFramesResult:
        i0 = self._prep(frame1)
        i1 = self._prep(frame2)
        xy1, xy2, ok, _ = self._match_fn(
            self.model.params, i0, i1, self.threshold, self.max_matches
        )
        ok = np.asarray(ok)
        sx, sy = self._scale
        kp1 = (np.asarray(xy1)[ok] * [sx, sy]).astype(np.int32)
        kp2 = (np.asarray(xy2)[ok] * [sx, sy]).astype(np.int32)
        return MatchFramesResult(
            frame1=frame1, frame2=frame2, keypoints1=kp1, keypoints2=kp2
        )

    def set_threshold(self, value: float) -> None:
        self.threshold = float(value)
