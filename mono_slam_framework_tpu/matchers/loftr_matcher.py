"""LoFTR DNN matcher plugin.

Capability twin of the reference DNNFeatureMatcher
(src/dnnfeaturematcher.{h,cpp}): run the LoFTR coarse model on two grayscale
frames, threshold the [1200,1200] confidence matrix, and decode cell pairs to
pixel coordinates at 16px resolution — row index = image-1 cell, col =
image-2 cell, x = (cell % 40)*16, y = (cell // 40)*16
(dnnfeaturematcher.cpp:75-100). Default threshold 0.1 (src/main.cpp:63).

TPU adaptation: the model is the repo-owned native JAX forward
(models/loftr_native.py — weights in models/weights/, no ONNX at runtime).
The backbone runs once per frame and its [L, C] features are cached by frame
id, so every additional match against the same frame pays only the pairwise
transformer; `match_against_many` vmaps that transformer over a stack of
cached keyframe features, turning the keyframe database's serial scan
(KeyFrameDatabase.cc:31, 63-70) into one batched device program. Selection
returns a fixed-capacity top-`max_matches` set by confidence (the reference
returns every cell above threshold; the static cap keeps shapes
jit-compatible and sits far above typical above-threshold counts).
"""

from __future__ import annotations

import numpy as np

from mono_slam_framework_tpu.matchers.base import FeatureMatcher, MatchFramesResult
from mono_slam_framework_tpu.models import loftr_native

MODEL_H, MODEL_W = 480, 640
CELL = 16  # model_resolution (src/main.cpp:64)
GRID_W = MODEL_W // CELL  # 40
GRID_H = MODEL_H // CELL  # 30
L = GRID_W * GRID_H  # 1200


def _decode_cells(flat_idx: np.ndarray):
    """flat (cell1 * L + cell2) -> integer pixel (x, y) per image."""
    cell1 = flat_idx // L
    cell2 = flat_idx - cell1 * L
    xy1 = np.stack([(cell1 % GRID_W) * CELL, (cell1 // GRID_W) * CELL], -1)
    xy2 = np.stack([(cell2 % GRID_W) * CELL, (cell2 // GRID_W) * CELL], -1)
    return xy1.astype(np.int32), xy2.astype(np.int32)


class LoftrFeatureMatcher(FeatureMatcher):
    def __init__(
        self,
        model_path: str | None = None,
        threshold: float = 0.1,
        max_matches: int = 1024,
        cache_size: int = 512,
        fine: bool = False,
    ):
        import collections

        self.params = loftr_native.load_params(model_path)
        self.threshold = float(threshold)
        self.max_matches = int(max_matches)
        self.cache_size = int(cache_size)
        # Optional training-free fine stage (loftr_native.fine_refine): the
        # reference model is coarse-only, 16 px cells; this sharpens match_
        # frames coordinates to subpixel via /4-feature correlation. Quality
        # extension beyond the reference — off by default.
        self.fine = bool(fine)
        # frame id -> ([1, L, C] device features, (sx, sy) image/model scale);
        # LRU-bounded like the ORB feature cache (153 KB per entry on device)
        self._feat_cache: "collections.OrderedDict" = collections.OrderedDict()
        # fine maps are ~1.2 MB each -> small separate LRU (pairwise
        # match_frames only; DB scans stay coarse)
        self._fine_cache: "collections.OrderedDict" = collections.OrderedDict()

    def _frame_key(self, frame):
        # explicit None test: matcher_key 0 (first frame after reset) is falsy
        key = getattr(frame, "matcher_key", None)
        return id(frame) if key is None else key

    def _features(self, frame):
        key = self._frame_key(frame)
        hit = self._feat_cache.get(key)
        if hit is not None:
            self._feat_cache.move_to_end(key)
            return hit
        import jax.numpy as jnp

        img = np.asarray(frame.image, np.float32)
        h, w = img.shape
        scale = (w / MODEL_W, h / MODEL_H)
        dev = jnp.asarray(img)
        if (h, w) != (MODEL_H, MODEL_W):
            import jax.image

            dev = jax.image.resize(dev, (MODEL_H, MODEL_W), "bilinear")
        feats = loftr_native.encode(self.params, (dev / 255.0)[None, None])
        self._feat_cache[key] = (feats, scale)
        if len(self._feat_cache) > self.cache_size:
            self._feat_cache.popitem(last=False)  # evict LRU; recomputable
        return feats, scale

    def drop_frame_cache(self, frame_id=None) -> None:
        if frame_id is None:
            self._feat_cache.clear()
            self._fine_cache.clear()
        else:
            self._feat_cache.pop(frame_id, None)
            self._fine_cache.pop(frame_id, None)

    def _fine_map(self, frame):
        """[16,H/4,W/4] device fine features for a frame (small LRU)."""
        key = self._frame_key(frame)
        hit = self._fine_cache.get(key)
        if hit is not None:
            self._fine_cache.move_to_end(key)
            return hit
        import jax.numpy as jnp

        img = np.asarray(frame.image, np.float32)
        h, w = img.shape
        dev = jnp.asarray(img)
        if (h, w) != (MODEL_H, MODEL_W):
            import jax.image

            dev = jax.image.resize(dev, (MODEL_H, MODEL_W), "bilinear")
        _, fine = loftr_native.encode_with_fine(
            self.params, (dev / 255.0)[None, None]
        )
        fine = fine[0]
        self._fine_cache[key] = fine
        if len(self._fine_cache) > 8:
            self._fine_cache.popitem(last=False)
        return fine

    def _sigma_octave(self, scale) -> float:
        """Effective 'octave' encoding the matcher's measurement sigma.

        The optimizers weight every edge by InvSigma2 = 1.2^(-2*octave)
        (upstream ORB-SLAM2 convention, restored by this rebuild), and gate
        inliers at chi2 = err^2 * InvSigma2 < 5.991. A 16 px coarse cell has
        ~CELL/2 px quantization sigma (~CELL/8 with fine refinement); report
        the octave whose 1.2^octave equals that sigma so LoFTR matches are
        judged at their real precision instead of ORB's ~1 px.
        """
        s = (CELL / 8.0 if self.fine else CELL / 2.0) * float(
            (scale[0] + scale[1]) * 0.5
        )
        return float(np.log(max(s, 1.0)) / np.log(1.2))

    def _decode_result(self, frame1, frame2, vals, idx, scale1, scale2):
        vals = np.asarray(vals)
        ok = vals > self.threshold
        xy1, xy2 = _decode_cells(np.asarray(idx)[ok])
        kp1 = (xy1 * np.asarray(scale1, np.float32)).astype(np.int32)
        kp2 = (xy2 * np.asarray(scale2, np.float32)).astype(np.int32)
        n = kp1.shape[0]
        return MatchFramesResult(
            frame1=frame1,
            frame2=frame2,
            keypoints1=kp1,
            keypoints2=kp2,
            octaves1=np.full(n, self._sigma_octave(scale1), np.float32),
            octaves2=np.full(n, self._sigma_octave(scale2), np.float32),
        )

    def match_frames(self, frame1, frame2) -> MatchFramesResult:
        f0, scale1 = self._features(frame1)
        f1, scale2 = self._features(frame2)
        vals, idx = loftr_native.match_features_topk(
            self.params, f0, f1, self.max_matches
        )
        res = self._decode_result(frame1, frame2, vals[0], idx[0], scale1, scale2)
        if self.fine and res.num_matches:
            vals_h = np.asarray(vals[0])
            idx_h = np.asarray(idx[0])
            cell1 = (idx_h // L).astype(np.int32)
            cell2 = (idx_h - (idx_h // L) * L).astype(np.int32)
            fm1 = self._fine_map(frame1)
            fm2 = self._fine_map(frame2)
            ok = vals_h > self.threshold
            # refine BOTH images' coordinates (each against the other's /4
            # neighborhood). IMPORTANT: the refined values ride ONLY in the
            # float measurements (keypoints*_f) — the integer keypoints stay
            # at the deterministic coarse cell corners so the exact-pixel
            # association keys (KeyPointMap, quirk B1) are stable across
            # match pairs; a refined integer would shift per pair and break
            # the stored-pixel lookup contract.
            for which, fma, fmb, ca, cb, scale, frame in (
                (2, fm1, fm2, cell1, cell2, scale2, frame2),
                (1, fm2, fm1, cell2, cell1, scale1, frame1),
            ):
                offs = np.asarray(
                    loftr_native.fine_refine(fma, fmb, ca, cb, GRID_W)
                )[ok]
                h, w = np.asarray(frame.image).shape
                kpf = (res.keypoints2 if which == 2 else res.keypoints1).astype(
                    np.float32
                )
                kpf[:, 0] = np.clip(kpf[:, 0] + offs[:, 0] * float(scale[0]), 0, w - 1)
                kpf[:, 1] = np.clip(kpf[:, 1] + offs[:, 1] * float(scale[1]), 0, h - 1)
                if which == 2:
                    res.keypoints2_f = kpf
                else:
                    res.keypoints1_f = kpf
        return res

    def match_against_many(self, frame, others):
        """One batched device call for a database scan (see module docstring)."""
        import jax.numpy as jnp

        if not others:
            return []
        fq, scale_q = self._features(frame)
        stacks, scales = [], []
        for o in others:
            f, s = self._features(o)
            stacks.append(f[0])
            scales.append(s)
        # coarse ladder capacity: one compile per rung, not per DB size
        from mono_slam_framework_tpu.utils.buckets import (
            MATCH_STACK_FLOOR,
            ladder_cap,
        )

        n = len(stacks)
        cap = ladder_cap(n, MATCH_STACK_FLOOR)
        stacks = stacks + [stacks[0]] * (cap - n)
        f_stack = jnp.stack(stacks)
        vals, idx = loftr_native.match_one_against_many(
            self.params, fq, f_stack, self.max_matches
        )
        vals, idx = np.asarray(vals), np.asarray(idx)
        return [
            self._decode_result(frame, o, vals[i], idx[i], scale_q, scales[i])
            for i, o in enumerate(others)
        ]

    def set_threshold(self, value: float) -> None:
        self.threshold = float(value)
