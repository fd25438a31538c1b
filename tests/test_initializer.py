"""Initializer tests: synthetic scenes with known R|t (SURVEY.md §4b)."""

import jax
import jax.numpy as jnp
import numpy as np

from mono_slam_framework_tpu.estimation import Initializer

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def general_scene(rng, n=150, noise=0.3, outliers=0):
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 10, n)],
        -1,
    ).astype(np.float32)
    ang = 0.1
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]],
        np.float32,
    )
    t = np.array([-0.8, 0.05, 0.02], np.float32)
    uv1 = (X[:, :2] / X[:, 2:]) * 500 + [320, 240]
    Xc2 = X @ R.T + t
    uv2 = (Xc2[:, :2] / Xc2[:, 2:]) * 500 + [320, 240]
    uv1 = uv1 + rng.normal(0, noise, uv1.shape)
    uv2 = uv2 + rng.normal(0, noise, uv2.shape)
    if outliers:
        idx = rng.choice(n, outliers, replace=False)
        uv2[idx] = rng.uniform(0, [640, 480], (outliers, 2))
    return X, R, t, uv1.astype(np.float32), uv2.astype(np.float32)


def planar_scene(rng, n=150, noise=0.3):
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 5.0)], -1
    ).astype(np.float32)
    ang = 0.12
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]],
        np.float32,
    )
    t = np.array([-0.7, 0.1, 0.05], np.float32)
    uv1 = (X[:, :2] / X[:, 2:]) * 500 + [320, 240]
    Xc2 = X @ R.T + t
    uv2 = (Xc2[:, :2] / Xc2[:, 2:]) * 500 + [320, 240]
    uv1 = uv1 + rng.normal(0, noise, uv1.shape)
    uv2 = uv2 + rng.normal(0, noise, uv2.shape)
    return X, R, t, uv1.astype(np.float32), uv2.astype(np.float32)


class TestInitializer:
    def test_general_scene_uses_fundamental(self, rng, key):
        X, R, t, uv1, uv2 = general_scene(rng)
        init = Initializer(K)
        res = init.initialize(uv1, uv2, key)
        assert res.success
        assert not res.used_homography
        assert np.abs(res.R21 - R).max() < 2e-2
        t_unit = t / np.linalg.norm(t)
        # 4e-2: the pow2 input padding (shape-stable jit) changes which
        # minimal sets the seeded RANSAC draws; accuracy is set by the
        # noise level, not the exact draw
        assert np.abs(res.t21 - t_unit).max() < 4e-2
        assert res.triangulated.sum() > 100
        # reconstructed points match ground truth up to a global scale (the
        # 8-point minimal-set F is unrefined, so absolute scale carries the
        # noise-amplified baseline error; the pipeline later renormalizes by
        # median depth + global BA, mirroring Tracking.cc:319-344)
        good = res.triangulated
        s = np.median(X[good][:, 2] / res.points3d[good][:, 2])
        np.testing.assert_allclose(
            res.points3d[good] * s, X[good], rtol=0.08, atol=0.2
        )

    def test_planar_scene_uses_homography(self, rng, key):
        X, R, t, uv1, uv2 = planar_scene(rng)
        init = Initializer(K)
        res = init.initialize(uv1, uv2, key)
        assert res.used_homography
        assert res.success
        assert np.abs(res.R21 - R).max() < 3e-2
        t_unit = t / np.linalg.norm(t)
        assert np.abs(res.t21 - t_unit).max() < 5e-2

    def test_outlier_robustness(self, rng, key):
        X, R, t, uv1, uv2 = general_scene(rng, n=200, outliers=50)
        init = Initializer(K)
        res = init.initialize(uv1, uv2, key)
        assert res.success
        assert np.abs(res.R21 - R).max() < 3e-2

    def test_pure_rotation_fails(self, rng, key):
        # no translation -> no parallax -> must reject
        X, _, _, uv1, _ = general_scene(rng, noise=0.0)
        ang = 0.05
        R = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]],
            np.float32,
        )
        Xc2 = X @ R.T
        uv2 = ((Xc2[:, :2] / Xc2[:, 2:]) * 500 + [320, 240]).astype(np.float32)
        init = Initializer(K)
        res = init.initialize(uv1, uv2, key)
        assert not res.success

    def test_deterministic_given_key(self, rng, key):
        X, R, t, uv1, uv2 = general_scene(rng)
        init = Initializer(K)
        r1 = init.initialize(uv1, uv2, key)
        r2 = init.initialize(uv1, uv2, key)
        np.testing.assert_array_equal(r1.R21, r2.R21)
        np.testing.assert_array_equal(r1.points3d, r2.points3d)

    def test_padding_mask(self, rng, key):
        X, R, t, uv1, uv2 = general_scene(rng)
        pad = np.zeros((50, 2), np.float32)
        uv1p = np.concatenate([uv1, pad])
        uv2p = np.concatenate([uv2, pad])
        valid = np.concatenate([np.ones(len(uv1), bool), np.zeros(50, bool)])
        init = Initializer(K)
        res = init.initialize(uv1p, uv2p, key, valid=valid)
        assert res.success
        assert not res.triangulated[len(uv1):].any()
        assert np.abs(res.R21 - R).max() < 2e-2


class TestDirectOracle:
    def test_direct_matches_ransac(self, rng, key):
        """The no-RANSAC oracle (reference InitializeOpenCV path) must agree
        with the RANSAC path on clean data."""
        X, R, t, uv1, uv2 = general_scene(rng, noise=0.2)
        init = Initializer(K)
        res_r = init.initialize(uv1, uv2, key)
        res_d = init.initialize_direct(uv1, uv2)
        assert res_r.success and res_d.success
        np.testing.assert_allclose(res_d.R21, res_r.R21, atol=5e-3)
        t_r = res_r.t21 / np.linalg.norm(res_r.t21)
        t_d = res_d.t21 / np.linalg.norm(res_d.t21)
        np.testing.assert_allclose(t_d, t_r, atol=2e-2)

    def test_direct_rejects_degenerate(self, rng):
        X, _, _, uv1, _ = general_scene(rng, noise=0.0)
        init = Initializer(K)
        res = init.initialize_direct(uv1[:10], uv1[:10] + 0.01)
        assert not res.success or res.triangulated.sum() < 25
