"""Golden tests for the geometry core on synthetic scenes with known R|t.

Implements SURVEY.md §4(b): geometry unit tests the reference never had.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mono_slam_framework_tpu.geometry import se3, projection, triangulation, epipolar


def random_pose(rng, max_angle=1.0, max_t=1.0):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rng.uniform(0, max_angle)
    t = rng.normal(size=3) * max_t
    T = np.asarray(se3.exp_se3(jnp.asarray(np.concatenate([w, t]), jnp.float64 if jax.config.x64_enabled else jnp.float32)))
    return T


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 6)).astype(np.float32) * 0.7
        T = se3.exp_se3(jnp.asarray(xi))
        xi2 = se3.log_se3(T)
        np.testing.assert_allclose(xi, np.asarray(xi2), atol=2e-5)

    def test_exp_small_angle(self):
        xi = jnp.asarray([1e-9, 0, 0, 0.1, 0.2, 0.3], jnp.float32)
        T = se3.exp_se3(xi)
        np.testing.assert_allclose(np.asarray(T[:3, 3]), [0.1, 0.2, 0.3], atol=1e-6)
        np.testing.assert_allclose(np.asarray(T[:3, :3]), np.eye(3), atol=1e-6)

    def test_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
        T = se3.exp_se3(xi)
        I = T @ se3.inverse(T)
        np.testing.assert_allclose(
            np.asarray(I), np.broadcast_to(np.eye(4), I.shape), atol=1e-5
        )

    def test_quaternion_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
        R = se3.exp_se3(xi)[..., :3, :3]
        q = se3.rotation_to_quaternion(R)
        R2 = se3.quaternion_to_rotation(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)

    def test_quaternion_known(self):
        # 90 deg about z
        R = jnp.asarray(
            [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
        )
        q = np.asarray(se3.rotation_to_quaternion(R))
        np.testing.assert_allclose(q, [0, 0, np.sqrt(0.5), np.sqrt(0.5)], atol=1e-6)

    def test_orthonormalize_projects_to_so3(self, rng):
        """The g2o-SE3Quat invariant restorer (round-2 manifold-decay fix,
        KNOWN_ISSUES.md): near-orthonormal rotations project back to SO(3)
        at float eps, exact rotations are fixed points, translation and the
        homogeneous row are untouched."""
        xi = jnp.asarray(rng.normal(size=6).astype(np.float32))
        T = np.asarray(se3.exp_se3(xi))
        # contaminate like the motion-model loop does: scale + noise
        T_bad = T.copy()
        T_bad[:3, :3] = T_bad[:3, :3] * 1.01 + rng.normal(
            scale=2e-3, size=(3, 3)
        ).astype(np.float32)
        T_fix = np.asarray(se3.orthonormalize(jnp.asarray(T_bad)))
        R = T_fix[:3, :3]
        assert np.abs(R @ R.T - np.eye(3)).max() < 1e-5
        assert np.linalg.det(R) > 0.999
        np.testing.assert_array_equal(T_fix[:3, 3], T_bad[:3, 3])
        np.testing.assert_array_equal(T_fix[3], T_bad[3])
        # projection is close to the original uncontaminated rotation
        assert np.abs(T_fix[:3, :3] - T[:3, :3]).max() < 5e-3
        # fixed point on exact rotations
        T_same = np.asarray(se3.orthonormalize(jnp.asarray(T)))
        np.testing.assert_allclose(T_same, T, atol=1e-6)

    def test_camera_center(self, rng):
        xi = jnp.asarray(rng.normal(size=6).astype(np.float32))
        T = se3.exp_se3(xi)
        Ow = se3.camera_center(T)
        np.testing.assert_allclose(
            np.asarray(T[:3, :3] @ Ow + T[:3, 3]), np.zeros(3), atol=1e-5
        )


def synthetic_two_view(rng, n=100, noise=0.0):
    """Points in front of two cameras with known relative pose."""
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    X = np.stack(
        [
            rng.uniform(-2, 2, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(4, 10, n),
        ],
        axis=-1,
    ).astype(np.float32)
    # camera 1 at origin; camera 2 translated + slightly rotated
    angle = 0.08
    Rcw2 = np.array(
        [
            [np.cos(angle), 0, np.sin(angle)],
            [0, 1, 0],
            [-np.sin(angle), 0, np.cos(angle)],
        ],
        np.float32,
    )
    tcw2 = np.array([-0.8, 0.05, 0.02], np.float32)

    def proj(R, t, X):
        Xc = X @ R.T + t
        return (Xc[:, :2] / Xc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]

    uv1 = proj(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), X)
    uv2 = proj(Rcw2, tcw2, X)
    if noise:
        uv1 = uv1 + rng.normal(0, noise, uv1.shape)
        uv2 = uv2 + rng.normal(0, noise, uv2.shape)
    return K, X, Rcw2, tcw2, uv1.astype(np.float32), uv2.astype(np.float32)


class TestTriangulation:
    def test_recovers_points(self, rng):
        K, X, R2, t2, uv1, uv2 = synthetic_two_view(rng)
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
        P2 = K @ np.hstack([R2, t2[:, None]]).astype(np.float32)
        Xhat, w = triangulation.triangulate_dlt(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(P1), jnp.asarray(P2)
        )
        np.testing.assert_allclose(np.asarray(Xhat), X, atol=2e-2)
        assert np.all(np.asarray(w) != 0)

    def test_parallax(self, rng):
        K, X, R2, t2, uv1, uv2 = synthetic_two_view(rng)
        cosp = triangulation.rays_cos_parallax(
            jnp.asarray(uv1),
            jnp.asarray(uv2),
            jnp.asarray(K),
            jnp.asarray(K),
            jnp.eye(3),
            jnp.asarray(R2.T),
        )
        c = np.asarray(cosp)
        assert np.all(c > 0.9) and np.all(c < 1.0)  # small but nonzero parallax


class TestProjection:
    def test_project_backproject(self, rng):
        K = jnp.asarray([[500.0, 0, 320], [0, 480.0, 240], [0, 0, 1]], jnp.float32)
        uv = jnp.asarray(rng.uniform(0, 640, (50, 2)).astype(np.float32))
        rays = projection.backproject(uv, K)
        uv2 = projection.project(rays * 3.7, K)
        np.testing.assert_allclose(np.asarray(uv), np.asarray(uv2), atol=1e-3)

    def test_in_frustum(self, rng):
        K, X, R2, t2, uv1, uv2 = synthetic_two_view(rng)
        Tcw = np.eye(4, dtype=np.float32)
        Tcw[:3, :3], Tcw[:3, 3] = R2, t2
        normals = X / np.linalg.norm(X, axis=-1, keepdims=True)
        vis = projection.in_frustum(
            jnp.asarray(Tcw),
            jnp.asarray(K),
            jnp.asarray(X),
            jnp.asarray(normals.astype(np.float32)),
            jnp.full(X.shape[0], 100.0, jnp.float32),
            640.0,
            480.0,
            viewing_cos_limit=0.5,
        )
        # all synthetic points are genuinely visible in camera 2
        assert np.asarray(vis).mean() > 0.95
        # points behind the camera are rejected
        Xback = jnp.asarray(-X)
        vis2 = projection.in_frustum(
            jnp.asarray(Tcw),
            jnp.asarray(K),
            Xback,
            jnp.asarray(normals.astype(np.float32)),
            jnp.full(X.shape[0], 100.0, jnp.float32),
            640.0,
            480.0,
        )
        assert np.asarray(vis2).mean() < 0.05


class TestEpipolar:
    def test_fundamental_on_clean_data(self, rng):
        K, X, R2, t2, uv1, uv2 = synthetic_two_view(rng)
        valid = jnp.ones(uv1.shape[0], bool)
        n1, T1 = epipolar.normalize_points(jnp.asarray(uv1), valid)
        n2, T2 = epipolar.normalize_points(jnp.asarray(uv2), valid)
        F_n = epipolar.compute_fundamental(n1[:8], n2[:8])
        F = T2.T @ F_n @ T1
        score, inliers = epipolar.score_fundamental(
            F, jnp.asarray(uv1), jnp.asarray(uv2), valid, sigma=1.0
        )
        assert np.asarray(inliers).mean() > 0.9

    def test_homography_on_plane(self, rng):
        # planar scene -> homography explains correspondences
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
        n = 60
        Xp = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 5.0)],
            axis=-1,
        ).astype(np.float32)
        angle = 0.1
        R = np.array(
            [
                [np.cos(angle), 0, np.sin(angle)],
                [0, 1, 0],
                [-np.sin(angle), 0, np.cos(angle)],
            ],
            np.float32,
        )
        t = np.array([-0.5, 0.1, 0.0], np.float32)
        uv1 = (Xp[:, :2] / Xp[:, 2:3]) * [500, 500] + [320, 240]
        Xc2 = Xp @ R.T + t
        uv2 = (Xc2[:, :2] / Xc2[:, 2:3]) * [500, 500] + [320, 240]
        valid = jnp.ones(n, bool)
        n1, T1 = epipolar.normalize_points(jnp.asarray(uv1, jnp.float32), valid)
        n2, T2 = epipolar.normalize_points(jnp.asarray(uv2, jnp.float32), valid)
        Hn = epipolar.compute_homography(n1[:8], n2[:8])
        H = jnp.linalg.inv(T2) @ Hn @ T1
        score, inliers = epipolar.score_homography(
            H,
            jnp.linalg.inv(H),
            jnp.asarray(uv1, jnp.float32),
            jnp.asarray(uv2, jnp.float32),
            valid,
            sigma=1.0,
        )
        assert np.asarray(inliers).mean() > 0.9

    def test_decompose_essential_recovers_motion(self, rng):
        K, X, R2, t2, uv1, uv2 = synthetic_two_view(rng)
        valid = jnp.ones(uv1.shape[0], bool)
        n1, T1 = epipolar.normalize_points(jnp.asarray(uv1), valid)
        n2, T2 = epipolar.normalize_points(jnp.asarray(uv2), valid)
        F_n = epipolar.compute_fundamental(n1[:8], n2[:8])
        F = T2.T @ F_n @ T1
        E = jnp.asarray(K).T @ F @ jnp.asarray(K)
        R1c, R2c, tc = epipolar.decompose_essential(E)
        t_unit = t2 / np.linalg.norm(t2)
        best_r = min(
            np.abs(np.asarray(Rc) - R2).max() for Rc in (R1c, R2c)
        )
        best_t = min(
            np.abs(np.asarray(s * tc) - t_unit).max() for s in (1.0, -1.0)
        )
        assert best_r < 5e-2
        assert best_t < 5e-2

    def test_faugeras_contains_true_motion(self, rng):
        # planar scene again; one of the 8 hypotheses must match R,t direction
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
        n = 60
        Xp = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 5.0)],
            axis=-1,
        ).astype(np.float32)
        angle = 0.15
        R = np.array(
            [
                [np.cos(angle), 0, np.sin(angle)],
                [0, 1, 0],
                [-np.sin(angle), 0, np.cos(angle)],
            ],
            np.float32,
        )
        t = np.array([-0.6, 0.1, 0.05], np.float32)
        uv1 = (Xp[:, :2] / Xp[:, 2:3]) * [500, 500] + [320, 240]
        Xc2 = Xp @ R.T + t
        uv2 = (Xc2[:, :2] / Xc2[:, 2:3]) * [500, 500] + [320, 240]
        valid = jnp.ones(n, bool)
        n1, T1 = epipolar.normalize_points(jnp.asarray(uv1, jnp.float32), valid)
        n2, T2 = epipolar.normalize_points(jnp.asarray(uv2, jnp.float32), valid)
        Hn = epipolar.compute_homography(n1[:8], n2[:8])
        H = jnp.linalg.inv(T2) @ Hn @ T1
        Rs, ts, ok = epipolar.decompose_homography_faugeras(H, jnp.asarray(K))
        assert bool(ok)
        t_unit = t / np.linalg.norm(t)
        errs_r = np.abs(np.asarray(Rs) - R).max(axis=(1, 2))
        errs_t = np.abs(np.asarray(ts) - t_unit).max(axis=1)
        assert np.min(errs_r + errs_t) < 0.1
