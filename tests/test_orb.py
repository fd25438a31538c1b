"""Kernel-level tests for the ORB front-end (SURVEY.md §4a).

No OpenCV in this environment, so these are property tests on synthetic
images: corners are found where corners are, descriptors match under
translation, the ratio test rejects garbage, and shapes/dtypes are static.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mono_slam_framework_tpu.ops import fast, filters, hamming, orb


def checkerboard(h=480, w=640, sq=40, lo=40.0, hi=220.0):
    yy, xx = np.mgrid[0:h, 0:w]
    board = ((yy // sq + xx // sq) % 2).astype(np.float32)
    return board * (hi - lo) + lo


def textured_image(rng, h=480, w=640):
    """Blurred random blobs — smooth but feature-rich."""
    img = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    img = np.array(filters.resize_bilinear(jnp.asarray(img), (h, w)))
    img[100:140, 200:260] = 255.0  # a bright rectangle: 4 strong corners
    return img


class TestFast:
    def test_flat_image_has_no_corners(self):
        img = jnp.full((64, 64), 128.0)
        is_corner, _ = fast.fast_score_map(img)
        assert not bool(jnp.any(is_corner))

    def test_rectangle_corners_found(self):
        img = np.full((96, 96), 30.0, np.float32)
        img[32:64, 32:64] = 200.0
        is_corner, score = fast.fast_score_map(jnp.asarray(img))
        c = np.asarray(is_corner)
        # corners of the square light up (within a few px)
        for cy, cx in [(32, 32), (32, 63), (63, 32), (63, 63)]:
            assert c[cy - 4 : cy + 5, cx - 4 : cx + 5].any(), (cy, cx)
        # centers of edges should NOT be corners
        assert not c[48 - 2 : 48 + 3, 32 - 2 : 32 + 3].any()

    def test_detect_static_shape_and_validity(self, rng):
        img = jnp.asarray(textured_image(rng))
        xs, ys, score, valid = fast.detect(img, 256)
        assert xs.shape == (256,)
        assert bool(valid[0])  # strongest slot valid on a textured image
        v = np.asarray(valid)
        s = np.asarray(score)
        assert np.all(np.isfinite(s[v]))
        # valid keypoints respect the border
        assert np.all(np.asarray(xs)[v] >= orb.BORDER)
        assert np.all(np.asarray(xs)[v] < 640 - orb.BORDER)


class TestOrbExtract:
    def test_shapes(self, rng):
        img = jnp.asarray(textured_image(rng))
        feats = orb.extract(img, 512)
        k = feats.xy.shape[0]
        assert feats.desc.shape == (k, 8)
        assert feats.desc.dtype == jnp.uint32
        assert feats.angle.shape == (k,)
        assert k >= 512  # budgets sum to >= requested

    def test_descriptors_stable_under_translation(self, rng):
        base = textured_image(rng)
        shift = 8
        img1 = jnp.asarray(base)
        img2 = jnp.asarray(np.roll(base, shift, axis=1))
        f1 = orb.extract(img1, 300)
        f2 = orb.extract(img2, 300)
        d = hamming.distance_matrix(f1.desc, f2.desc, f1.valid, f2.valid)
        idx2, ok = hamming.knn2_ratio_match(d, 0.7)
        ok = np.asarray(ok)
        assert ok.sum() >= 20
        xy1 = np.asarray(f1.xy)[ok]
        xy2 = np.asarray(f2.xy)[np.asarray(idx2)[ok]]
        dx = xy2[:, 0] - xy1[:, 0]
        dy = xy2[:, 1] - xy1[:, 1]
        # majority of matches should recover the known translation
        good = (np.abs(dx - shift) <= 2) & (np.abs(dy) <= 2)
        assert good.mean() > 0.7

    def test_onehot_descriptor_path_bit_identical(self, rng):
        """The MXU one-hot descriptor sampling (the TPU default) must be
        bit-identical to the gather path (the CPU default): blur is rounded
        to integers, which bf16 represents exactly, so the one-hot matmul
        chain selects exactly the gathered values (ops/orb.py DESC_R
        contract)."""
        img = jnp.asarray(textured_image(rng, h=160, w=192))
        fa = orb.extract(img, 120, use_fused=False, onehot_desc=False)
        fb = orb.extract(img, 120, use_fused=False, onehot_desc=True)
        np.testing.assert_array_equal(np.asarray(fa.desc), np.asarray(fb.desc))
        np.testing.assert_array_equal(np.asarray(fa.xy), np.asarray(fb.xy))

    def test_bilinear_weight_mat_matches_jax_resize(self, rng):
        """The numpy resize-weight twin (used by the multi-level TPU path's
        matmul pyramid) must reproduce jax.image.resize bilinear."""
        import jax

        from mono_slam_framework_tpu.ops.orb import _bilinear_weight_mat

        x = rng.uniform(0, 255, (480, 640)).astype(np.float32)
        for l in (1, 4, 7):
            h, w = orb._level_dims(480, 640)[l]
            ref = np.asarray(
                jax.image.resize(jnp.asarray(x), (h, w), "bilinear")
            )
            got = (
                _bilinear_weight_mat(480, h)
                @ x
                @ _bilinear_weight_mat(640, w).T
            )
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-2)

    def test_ratio_test_rejects_unrelated_images(self, rng):
        img1 = jnp.asarray(textured_image(rng))
        rng2 = np.random.default_rng(999)
        img2 = jnp.asarray(textured_image(rng2))
        f1 = orb.extract(img1, 300)
        f2 = orb.extract(img2, 300)
        d = hamming.distance_matrix(f1.desc, f2.desc, f1.valid, f2.valid)
        _, ok_strict = hamming.knn2_ratio_match(d, 0.6)
        assert np.asarray(ok_strict).mean() < 0.25


class TestHamming:
    def test_distance_exact(self, rng):
        a = rng.integers(0, 2**32, size=(16, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, size=(24, 8), dtype=np.uint32)
        d = np.asarray(
            hamming.distance_matrix(
                jnp.asarray(a), jnp.asarray(b), jnp.ones(16, bool), jnp.ones(24, bool)
            )
        )
        # reference popcount
        abits = np.unpackbits(a.view(np.uint8), axis=1)
        bbits = np.unpackbits(b.view(np.uint8), axis=1)
        expect = (abits[:, None, :] != bbits[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d.astype(np.int64), expect)

    def test_invalid_masked(self):
        a = jnp.zeros((4, 8), jnp.uint32)
        d = hamming.distance_matrix(
            a, a, jnp.asarray([True, True, False, True]), jnp.ones(4, bool)
        )
        assert bool(jnp.isinf(d[2]).all())


class TestOrbMatcher:
    def test_match_frames_contract(self, rng):
        from mono_slam_framework_tpu.matchers import OrbFeatureMatcher

        class _F:  # minimal frame stand-in
            def __init__(self, i, img):
                self.id = i
                self.image = img

        base = textured_image(rng)
        fa = _F(0, base)
        fb = _F(1, np.roll(base, 5, axis=0))
        m = OrbFeatureMatcher(threshold=0.7, max_features=300)
        res = m.match_frames(fa, fb)
        assert res.num_matches > 10
        assert res.keypoints1.shape == res.keypoints2.shape
        assert res.keypoints1.dtype == np.int32
        # batched interface agrees with the single-pair path
        many = m.match_against_many(fa, [fb, fb])
        assert many[0].num_matches == res.num_matches
        np.testing.assert_array_equal(many[1].keypoints2, res.keypoints2)


class TestOrbRegression:
    """Determinism + quality pins for the front end (VERDICT round 1: keypoint
    selection uses approx_max_k and an own rBRIEF pattern — regression-guard
    the exact output so front-end changes can't silently degrade matching)."""

    GOLDEN = os.path.join(os.path.dirname(__file__), "data", "orb_golden.npz")

    def test_golden_extraction(self):
        """Exact keypoint/descriptor pin on a fixed image (CPU backend: the
        top_k selection path is fully deterministic; guards drift across jax
        versions and refactors of the detect/orient/describe stages)."""
        if jax.default_backend() != "cpu":
            pytest.skip("golden values pinned on the deterministic CPU path")
        g = np.load(self.GOLDEN)
        img = jnp.asarray(textured_image(np.random.default_rng(int(g["img_seed"]))))
        f = orb.extract(img, 300)
        np.testing.assert_array_equal(np.asarray(f.valid), g["valid"])
        np.testing.assert_allclose(np.asarray(f.xy), g["xy"], atol=1e-4)
        np.testing.assert_array_equal(np.asarray(f.desc), g["desc"])
        np.testing.assert_array_equal(np.asarray(f.octave), g["octave"])
        np.testing.assert_allclose(np.asarray(f.angle), g["angle"], atol=1e-4)

    def test_known_shift_recall(self):
        """Recall of ground-truth correspondences on a known translation:
        every level-0 keypoint in the overlap has an exact GT partner, so
        matcher recall at 2 px is a direct front-end quality metric."""
        rng = np.random.default_rng(11)
        base = textured_image(rng)
        shift = 12
        f1 = orb.extract(jnp.asarray(base), 400)
        f2 = orb.extract(jnp.asarray(np.roll(base, shift, axis=1)), 400)
        d = hamming.distance_matrix(f1.desc, f2.desc, f1.valid, f2.valid)
        idx2, ok = hamming.knn2_ratio_match(d, 0.7)
        ok = np.asarray(ok) & np.asarray(f1.valid)
        xy1 = np.asarray(f1.xy)
        xy2 = np.asarray(f2.xy)[np.asarray(idx2)]
        # keypoints whose GT partner stays in frame
        in_overlap = (xy1[:, 0] < 640 - shift - orb.BORDER) & ok
        err = np.hypot(
            xy2[:, 0] - xy1[:, 0] - shift, xy2[:, 1] - xy1[:, 1]
        )
        recall2 = (err[in_overlap] <= 2.0).mean()
        assert recall2 > 0.85, recall2
        # and the median localization error of correct matches stays subpixel
        correct = err[in_overlap][err[in_overlap] <= 2.0]
        assert np.median(correct) < 1.0
