"""EPnP + RANSAC relocalization solver tests (SURVEY.md §4b)."""

import jax
import numpy as np

from mono_slam_framework_tpu.estimation.epnp import solve_pnp_ransac
from mono_slam_framework_tpu.geometry import se3

import jax.numpy as jnp

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def make_problem(rng, n=60, noise=0.5, n_outliers=0):
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 10, n)],
        -1,
    ).astype(np.float32)
    xi = np.concatenate([rng.normal(size=3) * 0.1, rng.normal(size=3) * 0.3])
    T = np.asarray(se3.exp_se3(jnp.asarray(xi, jnp.float32)))
    Xc = X @ T[:3, :3].T + T[:3, 3]
    uv = (Xc[:, :2] / Xc[:, 2:]) * 500 + [320, 240]
    uv = uv + rng.normal(0, noise, uv.shape)
    out_idx = np.array([], int)
    if n_outliers:
        out_idx = rng.choice(n, n_outliers, replace=False)
        uv[out_idx] += rng.uniform(40, 150, (n_outliers, 2))
    return T, X, uv.astype(np.float32), out_idx


class TestEPnP:
    def test_recovers_pose(self, rng, key):
        T, X, uv, _ = make_problem(rng)
        ok, Tcw, inl = solve_pnp_ransac(X, uv, K, key)
        assert ok
        assert np.abs(Tcw - T).max() < 5e-2
        assert inl.sum() >= 50

    def test_outlier_rejection(self, rng, key):
        T, X, uv, out_idx = make_problem(rng, n=80, n_outliers=20)
        ok, Tcw, inl = solve_pnp_ransac(X, uv, K, key)
        assert ok
        assert np.abs(Tcw - T).max() < 8e-2
        assert not inl[out_idx].any()

    def test_too_few_points(self, rng, key):
        T, X, uv, _ = make_problem(rng, n=3)
        ok, Tcw, inl = solve_pnp_ransac(X, uv, K, key)
        assert not ok

    def test_garbage_rejected(self, rng, key):
        X = rng.uniform(-2, 2, (40, 3)).astype(np.float32)
        uv = rng.uniform(0, 640, (40, 2)).astype(np.float32)
        ok, Tcw, inl = solve_pnp_ransac(X, uv, K, key)
        # random correspondences can't reach the adaptive min-inlier bar
        assert not ok

    def test_deterministic(self, rng, key):
        T, X, uv, _ = make_problem(rng)
        ok1, T1, i1 = solve_pnp_ransac(X, uv, K, key)
        ok2, T2, i2 = solve_pnp_ransac(X, uv, K, key)
        assert ok1 == ok2
        np.testing.assert_array_equal(T1, T2)
        np.testing.assert_array_equal(i1, i2)
