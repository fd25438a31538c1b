"""LoFTR model + matcher tests (SURVEY.md §4a: DNN path golden tests).

The runtime model is the native JAX forward (models/loftr_native.py) with
repo-owned weights. Its golden oracle is the in-repo ONNX interpreter
(models/loftr.py) run on the reference export — exercised when that file is
present (it is in the build image; the parity test skips gracefully
elsewhere). Semantic checks (diagonal self-match, known-shift recovery,
decode/threshold contract per dnnfeaturematcher.cpp:75-100) run everywhere.
"""

import os

import numpy as np
import pytest

from mono_slam_framework_tpu.models import loftr_native

from synthetic_world import PlaneWorld, lateral_trajectory

REFERENCE_ONNX = "/root/reference/model/LoFTR_teacher.onnx"


@pytest.fixture(scope="module")
def params():
    return loftr_native.load_params()


@pytest.fixture(scope="module")
def rendered_pair():
    world = PlaneWorld(width=640, height=480, f=500.0, second_plane=(3.0, 0.3))
    poses = lateral_trajectory(4, step=0.2)
    return world.render(poses[0]), world.render(poses[2])


def _conf(params, a, b):
    import jax.numpy as jnp

    return np.asarray(
        loftr_native.loftr_confidence(
            params,
            jnp.asarray((a / 255.0)[None, None], jnp.float32),
            jnp.asarray((b / 255.0)[None, None], jnp.float32),
        )
    )


class TestNativeModel:
    def test_confidence_shape_and_range(self, params, rendered_pair):
        a, b = rendered_pair
        conf = _conf(params, a, b)
        assert conf.shape == (1, 1200, 1200)
        assert conf.min() >= 0.0 and conf.max() <= 1.0

    def test_self_match_diagonal(self, params, rendered_pair):
        a, _ = rendered_pair
        conf = _conf(params, a, a)[0]
        frac = (conf.argmax(axis=1) == np.arange(1200)).mean()
        assert frac > 0.9

    def test_shift_recovered(self, params, rendered_pair):
        a, b = rendered_pair
        conf = _conf(params, a, b)[0]
        strong = conf.max(axis=1) > 0.2
        assert strong.sum() > 5
        am = conf.argmax(axis=1)
        dx = (am % 40) - (np.arange(1200) % 40)
        # camera moved +x -> features shift -x; planes at z=3..5 with
        # f*t = 200 -> 2.5..4.2 cells
        med = np.median(dx[strong])
        assert -5 <= med <= -2, med

    def test_posenc_matches_exported_table(self, params):
        # the stored 480x640 table must equal the regenerated formula
        table = np.asarray(params["posenc"])
        gen = np.asarray(loftr_native.positional_encoding(30, 40))
        assert np.abs(table - gen).max() < 1e-6

    def test_encode_is_resolution_independent(self, params):
        import jax.numpy as jnp

        img = jnp.zeros((1, 1, 240, 320), jnp.float32)
        feats = loftr_native.encode(params, img)
        assert feats.shape == (1, 15 * 20, 32)


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_ONNX), reason="reference ONNX export not present"
)
class TestGoldenParity:
    """Native forward vs the ONNX-graph interpreter on the same weights."""

    def test_confidence_parity(self, params, rendered_pair):
        import jax.numpy as jnp

        from mono_slam_framework_tpu.models.loftr import LoftrModel

        a, b = rendered_pair
        interp = LoftrModel(REFERENCE_ONNX)
        ref = np.asarray(
            interp.confidence(
                jnp.asarray((a / 255.0)[None, None], jnp.float32),
                jnp.asarray((b / 255.0)[None, None], jnp.float32),
            )
        )
        mine = _conf(params, a, b)
        assert np.abs(ref - mine).max() < 1e-5
        assert (ref.argmax(-1) == mine.argmax(-1)).mean() > 0.999

    def test_weights_match_onnx_initializers(self, params):
        from mono_slam_framework_tpu.models.onnx_reader import load_graph

        g = load_graph(REFERENCE_ONNX)
        assert np.array_equal(np.asarray(params["coarse/0/wq"]), g.initializers["1087"])
        assert np.array_equal(
            np.asarray(params["backbone/conv1/w"]), g.initializers["1028"]
        )


class _F:
    def __init__(self, i, img):
        self.id, self.image, self.matcher_key = i, img, ("L", i)


class TestLoftrMatcher:
    def test_match_frames_contract(self, rendered_pair):
        from mono_slam_framework_tpu.matchers.loftr_matcher import LoftrFeatureMatcher

        a, b = rendered_pair
        m = LoftrFeatureMatcher(threshold=0.15)
        res = m.match_frames(_F(0, a), _F(1, b))
        assert res.num_matches > 5
        assert res.keypoints1.dtype == np.int32
        # decoded coords are multiples of the 16px cell size
        assert (res.keypoints1 % 16 == 0).all()
        assert (res.keypoints2 % 16 == 0).all()
        # raising the threshold reduces matches (SetThreshold surface)
        m.set_threshold(0.5)
        res2 = m.match_frames(_F(0, a), _F(1, b))
        assert res2.num_matches <= res.num_matches

    def test_match_against_many_equals_serial(self, rendered_pair):
        """The batched DB-scan path must reproduce the per-pair results."""
        from mono_slam_framework_tpu.matchers.loftr_matcher import LoftrFeatureMatcher

        a, b = rendered_pair
        frames = [_F(0, a), _F(1, b), _F(2, a)]
        m = LoftrFeatureMatcher(threshold=0.15)
        query = _F(9, b)
        batched = m.match_against_many(query, frames)
        assert len(batched) == 3
        for fr, res in zip(frames, batched):
            serial = m.match_frames(query, fr)
            assert res.num_matches == serial.num_matches
            assert np.array_equal(
                np.sort(res.keypoints1, axis=0), np.sort(serial.keypoints1, axis=0)
            )

    def test_feature_cache(self, rendered_pair):
        from mono_slam_framework_tpu.matchers.loftr_matcher import LoftrFeatureMatcher

        a, b = rendered_pair
        m = LoftrFeatureMatcher()
        f1, f2 = _F(0, a), _F(1, b)
        m.match_frames(f1, f2)
        assert len(m._feat_cache) == 2
        m.match_frames(f1, f2)  # cache hits, no growth
        assert len(m._feat_cache) == 2
        m.drop_frame_cache(f1.matcher_key)
        assert len(m._feat_cache) == 1
        m.drop_frame_cache()
        assert not m._feat_cache


class TestFineRefine:
    def test_subpixel_shift_recovered(self, rendered_pair):
        """A 6 px pure image shift: coarse decode quantizes to 16 px cells
        (error ~6 px); the training-free fine stage should recover most of
        the fractional-cell shift."""
        from mono_slam_framework_tpu.matchers.loftr_matcher import (
            LoftrFeatureMatcher,
        )

        a, _ = rendered_pair
        shift = 6
        b = np.roll(a, -shift, axis=1)  # content moves -x by 6 px

        coarse = LoftrFeatureMatcher(threshold=0.15)
        fine = LoftrFeatureMatcher(threshold=0.15, fine=True)
        rc = coarse.match_frames(_F(0, a), _F(1, b))
        rf = fine.match_frames(_F(0, a), _F(1, b))
        assert rf.num_matches == rc.num_matches > 10

        # true correspondence: x2 = x1 - shift (borders excluded)
        def med_err(res, kp2):
            x1 = res.keypoints1[:, 0].astype(np.float32)
            inner = (x1 > 32) & (x1 < 640 - 32)
            return np.median(np.abs((x1[inner] - shift) - kp2[inner, 0]))

        e_coarse = med_err(rc, rc.keypoints2.astype(np.float32))
        e_fine = med_err(rf, rf.kp2_f)
        assert e_fine < e_coarse, (e_fine, e_coarse)
        assert e_fine < 3.0, e_fine
        # offsets stay inside the coarse cell
        d = rf.kp2_f - rc.keypoints2.astype(np.float32)
        assert np.abs(d).max() <= 8.0 + 1e-3
        # y untouched by a pure-x shift (allow small correlation noise)
        assert np.median(np.abs(rf.kp2_f[:, 1] - rc.keypoints2[:, 1])) < 2.0
