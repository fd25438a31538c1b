"""ORB + brute-force-Hamming matcher plugin (TPU-native).

Capability twin of the reference's ORB plugin (src/featurematcher.{h,cpp}):
cv::ORB::create() + BruteForce-Hamming knnMatch(k=2) + Lowe ratio test with
strict '<' (featurematcher.cpp:32) and integer-truncated keypoint coordinates
(featurematcher.cpp:33-38). Defaults: 500-feature budget, ratio 0.6 set by the
application (reference src/main.cpp:66).

The extract and match stages are separate jitted programs; per-frame features
are cached by frame id (pure optimization — the reference recomputes both
sides every call but produces the same matches given the same features).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


from mono_slam_framework_tpu.matchers.base import FeatureMatcher, MatchFramesResult
from mono_slam_framework_tpu.ops import hamming, orb


@functools.partial(jax.jit, static_argnames=("max_features", "fast_threshold"))
def _extract_jit(img, max_features, fast_threshold):
    return orb.extract(img, max_features, fast_threshold)


@jax.jit
def _match_jit(f1: orb.Features, f2: orb.Features, ratio):
    d = hamming.distance_matrix(f1.desc, f2.desc, f1.valid, f2.valid)
    idx2, ok = hamming.knn2_ratio_match(d, ratio)
    xy1 = f1.xy.astype(jnp.int32)  # truncation, featurematcher.cpp:33-38
    xy2 = f2.xy[idx2].astype(jnp.int32)
    return xy1, xy2, f1.xy, f2.xy[idx2], f1.octave, f2.octave[idx2], ok & f1.valid


@jax.jit
def _match_many_jit(f1: orb.Features, stacked: orb.Features, ratio):
    def one(f2):
        return _match_jit(f1, f2, ratio)

    return jax.vmap(one)(stacked)


class OrbFeatureMatcher(FeatureMatcher):
    def __init__(
        self,
        threshold: float = 0.6,
        max_features: int = 500,
        fast_threshold: float = 20.0,
        cache_size: int = 512,
        subpixel: bool = True,
    ):
        """`subpixel=True` carries quadratic-refined float coordinates as
        measurements alongside the integer contract (KNOWN_ISSUES.md)."""
        self.threshold = float(threshold)
        self.subpixel = bool(subpixel)
        self.max_features = int(max_features)
        self.fast_threshold = float(fast_threshold)
        self.cache_size = int(cache_size)
        import collections

        self._cache: "collections.OrderedDict[object, orb.Features]" = (
            collections.OrderedDict()
        )

    # -- feature extraction with per-image LRU caching ---------------------
    def features_for(self, frame) -> orb.Features:
        # Frames expose `matcher_key` (unique per distinct image; clones and
        # derived KeyFrames share it). Fall back to object identity for bare
        # test stand-ins.
        fid = getattr(frame, "matcher_key", None)
        if fid is None:
            fid = id(frame)
        feats = self._cache.get(fid)
        if feats is None:
            img = jnp.asarray(frame.image, jnp.float32)
            feats = _extract_jit(img, self.max_features, self.fast_threshold)
            self._cache[fid] = feats
            if len(self._cache) > self.cache_size:
                self._cache.popitem(last=False)  # evict LRU; recomputable
        else:
            self._cache.move_to_end(fid)
        return feats

    def seed_cache(self, frame, feats: orb.Features) -> None:
        """Insert externally-extracted features (e.g. from the fused tracking
        step, which runs extraction inside its device program) so later
        stages reuse them without re-extracting."""
        fid = getattr(frame, "matcher_key", None)
        if fid is None:
            fid = id(frame)
        self._cache[fid] = feats
        self._cache.move_to_end(fid)
        if len(self._cache) > self.cache_size:
            self._cache.popitem(last=False)

    def drop_frame_cache(self, frame_id=None) -> None:
        if frame_id is None:
            self._cache.clear()
        else:
            self._cache.pop(frame_id, None)

    # -- FeatureMatcher interface ------------------------------------------
    def match_frames(self, frame1, frame2) -> MatchFramesResult:
        f1 = self.features_for(frame1)
        f2 = self.features_for(frame2)
        # ONE host readback for all outputs: each separate np.asarray is a
        # blocking device->host transfer (~27 ms RTT through the axon relay)
        xy1, xy2, xy1f, xy2f, oc1, oc2, ok = jax.device_get(
            _match_jit(f1, f2, self.threshold)
        )
        return MatchFramesResult(
            frame1=frame1,
            frame2=frame2,
            keypoints1=xy1[ok],
            keypoints2=xy2[ok],
            keypoints1_f=xy1f[ok] if self.subpixel else None,
            keypoints2_f=xy2f[ok] if self.subpixel else None,
            octaves1=oc1[ok],
            octaves2=oc2[ok],
        )

    def match_against_many(self, frame, others):
        if not others:
            return []
        f1 = self.features_for(frame)
        feats = [self.features_for(o) for o in others]
        # pad the stack to a coarse factor-4 ladder capacity so the vmapped
        # program compiles once per rung, not once per keyframe count
        # (relay-attached TPU compiles cost minutes; local-map/DB sizes
        # change every frame). Rung 0 is warmed at System init.
        from mono_slam_framework_tpu.utils.buckets import (
            MATCH_STACK_FLOOR,
            ladder_cap,
        )

        n = len(feats)
        cap = ladder_cap(n, MATCH_STACK_FLOOR)
        feats = feats + [feats[0]] * (cap - n)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *feats)
        # background-warm the next rung before the local map / database
        # grows into it (no-op unless prewarming is enabled; size-bounded —
        # huge speculative stacks cost compiler memory for executables that
        # may never run)
        if cap <= 128:
            self.prewarm_match_many(4 * cap)
        xy1, xy2, xy1f, xy2f, oc1, oc2, ok = jax.device_get(
            _match_many_jit(f1, stacked, self.threshold)
        )
        results = []
        for i, o in enumerate(others):
            m = ok[i]
            results.append(
                MatchFramesResult(
                    frame1=frame,
                    frame2=o,
                    keypoints1=xy1[i][m],
                    keypoints2=xy2[i][m],
                    keypoints1_f=xy1f[i][m] if self.subpixel else None,
                    keypoints2_f=xy2f[i][m] if self.subpixel else None,
                    octaves1=oc1[i][m],
                    octaves2=oc2[i][m],
                )
            )
        return results

    def prewarm_match_many(self, cap: int | None = None) -> None:
        """Background-warm the `match_against_many` executable at stack
        capacity `cap` (rung 0 when None) from abstract feature shapes —
        called at System init (device_io.prewarm_startup_shapes) and on
        rung growth so batched DB scans / sweeps never stall on a relay
        executable load (VERDICT r3 #2)."""
        from mono_slam_framework_tpu.ops.orb import Features, _per_level_budget
        from mono_slam_framework_tpu.utils.buckets import MATCH_STACK_FLOOR
        from mono_slam_framework_tpu.utils.prewarm import prewarm

        if cap is None:
            cap = MATCH_STACK_FLOOR
        # slot count = summed per-level budgets (ops/orb.extract contract)
        F = sum(_per_level_budget(self.max_features))
        sds = jax.ShapeDtypeStruct

        def feat_spec(lead=()):
            return Features(
                xy=sds(lead + (F, 2), jnp.float32),
                angle=sds(lead + (F,), jnp.float32),
                desc=sds(lead + (F, 8), jnp.uint32),
                score=sds(lead + (F,), jnp.float32),
                valid=sds(lead + (F,), jnp.bool_),
                octave=sds(lead + (F,), jnp.int32),
            )

        prewarm(_match_many_jit, feat_spec(), feat_spec((cap,)), self.threshold)

    def set_threshold(self, value: float) -> None:
        self.threshold = float(value)
