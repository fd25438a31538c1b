"""Optimizer tests: pose LM + Schur BA vs an independent f64 oracle.

SURVEY.md §4c: parity target <= 1e-3 reprojection RMSE difference vs the CPU
reference implementation (stand-in for g2o, which isn't in this image).
"""

import jax
import jax.numpy as jnp
import numpy as np

import lm_oracle
from mono_slam_framework_tpu.geometry import se3
from mono_slam_framework_tpu.optim import (
    bundle_adjust,
    build_problem,
    local_bundle_adjust,
    pose_optimize,
)

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def make_pose_problem(rng, n=120, noise=0.5, n_outliers=0, perturb=0.05):
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 10, n)],
        -1,
    )
    xi_true = rng.normal(size=6) * 0.1
    T_true = np.asarray(se3.exp_se3(jnp.asarray(xi_true, jnp.float32)), np.float64)
    Xc = X @ T_true[:3, :3].T + T_true[:3, 3]
    uv = (Xc[:, :2] / Xc[:, 2:]) * 500 + [320, 240]
    uv = uv + rng.normal(0, noise, uv.shape)
    if n_outliers:
        idx = rng.choice(n, n_outliers, replace=False)
        uv[idx] += rng.uniform(30, 120, (n_outliers, 2)) * rng.choice(
            [-1, 1], (n_outliers, 2)
        )
    xi0 = xi_true + rng.normal(size=6) * perturb
    T0 = np.asarray(se3.exp_se3(jnp.asarray(xi0, jnp.float32)), np.float64)
    return T_true, T0, X, uv, (idx if n_outliers else np.array([], int))


def rmse_pose(T, X, uv, mask):
    r, _, _, _, _ = lm_oracle._terms(np.asarray(T, np.float64), X, uv, K)
    r = r[mask]
    return float(np.sqrt(np.mean(np.sum(r * r, -1))))


class TestPoseOptimize:
    def test_recovers_pose(self, rng):
        T_true, T0, X, uv, _ = make_pose_problem(rng)
        valid = jnp.ones(len(X), bool)
        T_opt, inlier, n_good = pose_optimize(
            jnp.asarray(T0, jnp.float32),
            jnp.asarray(X, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            valid,
            jnp.asarray(K),
        )
        assert int(n_good) > 100
        # optimized pose much closer to truth than the perturbed start
        err0 = np.abs(T0 - T_true).max()
        err1 = np.abs(np.asarray(T_opt, np.float64) - T_true).max()
        assert err1 < err0 * 0.2
        assert rmse_pose(np.asarray(T_opt), X, uv, np.asarray(inlier)) < 1.2

    def test_outlier_classification(self, rng):
        T_true, T0, X, uv, out_idx = make_pose_problem(rng, n_outliers=20)
        valid = jnp.ones(len(X), bool)
        T_opt, inlier, n_good = pose_optimize(
            jnp.asarray(T0, jnp.float32),
            jnp.asarray(X, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            valid,
            jnp.asarray(K),
        )
        inlier = np.asarray(inlier)
        assert not inlier[out_idx].any()  # all planted outliers flagged
        assert inlier.sum() >= 90

    def test_parity_with_f64_oracle(self, rng):
        T_true, T0, X, uv, _ = make_pose_problem(rng, noise=0.8)
        valid = np.ones(len(X), bool)
        T_opt, inlier, _ = pose_optimize(
            jnp.asarray(T0, jnp.float32),
            jnp.asarray(X, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            jnp.asarray(valid),
            jnp.asarray(K),
        )
        T_ref, inlier_ref = lm_oracle.pose_optimize_oracle(T0, X, uv, valid, K)
        m = np.asarray(inlier) & inlier_ref
        r_jax = rmse_pose(np.asarray(T_opt), X, uv, m)
        r_ref = rmse_pose(T_ref, X, uv, m)
        assert abs(r_jax - r_ref) < 1e-3, (r_jax, r_ref)

    def test_pallas_kernel_parity(self, rng):
        """The one-kernel Pallas LM (the TPU default) must match the XLA
        path: same 4x10 schedule, Huber/Nielsen policies, reclassification
        (interpret mode here; tolerance = f32 reassociation noise)."""
        from mono_slam_framework_tpu.optim import pose_opt_pallas

        T_true, T0, X, uv, _ = make_pose_problem(rng, noise=0.8, n_outliers=8)
        valid = np.ones(len(X), bool)
        valid[-7:] = False
        info = rng.uniform(0.5, 1.5, len(X)).astype(np.float32)
        args = (
            jnp.asarray(T0, jnp.float32),
            jnp.asarray(X, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            jnp.asarray(valid),
            jnp.asarray(K),
            jnp.asarray(info),
        )
        T_ref, in_ref, ng_ref = pose_optimize(*args)
        T_ker, in_ker, ng_ker = pose_opt_pallas.pose_optimize_pallas(
            *args, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(T_ker), np.asarray(T_ref), atol=1e-4
        )
        assert (np.asarray(in_ker) == np.asarray(in_ref)).mean() > 0.98
        assert abs(int(ng_ker) - int(ng_ref)) <= 2

    def test_padding_invariance(self, rng):
        T_true, T0, X, uv, _ = make_pose_problem(rng)
        Xp = np.concatenate([X, np.zeros((40, 3))])
        uvp = np.concatenate([uv, np.zeros((40, 2))])
        valid = np.concatenate([np.ones(len(X), bool), np.zeros(40, bool)])
        T_a, _, ng_a = pose_optimize(
            jnp.asarray(T0, jnp.float32),
            jnp.asarray(X, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            jnp.ones(len(X), bool),
            jnp.asarray(K),
        )
        T_b, _, ng_b = pose_optimize(
            jnp.asarray(T0, jnp.float32),
            jnp.asarray(Xp, jnp.float32),
            jnp.asarray(uvp, jnp.float32),
            jnp.asarray(valid),
            jnp.asarray(K),
        )
        assert int(ng_a) == int(ng_b)
        np.testing.assert_allclose(np.asarray(T_a), np.asarray(T_b), atol=1e-5)


def make_ba_problem(rng, n_cams=4, n_pts=60, noise=0.4, point_jitter=0.05):
    X = np.stack(
        [
            rng.uniform(-2, 2, n_pts),
            rng.uniform(-1.5, 1.5, n_pts),
            rng.uniform(4, 10, n_pts),
        ],
        -1,
    )
    cams_true = []
    for c in range(n_cams):
        xi = np.concatenate([rng.normal(size=3) * 0.03, rng.normal(size=3) * 0.2])
        xi[3] += 0.3 * c  # spread along x
        cams_true.append(
            np.asarray(se3.exp_se3(jnp.asarray(xi, jnp.float32)), np.float64)
        )
    e_cam, e_pt, e_uv = [], [], []
    for c, T in enumerate(cams_true):
        Xc = X @ T[:3, :3].T + T[:3, 3]
        uv = (Xc[:, :2] / Xc[:, 2:]) * 500 + [320, 240]
        uv = uv + rng.normal(0, noise, uv.shape)
        inside = (
            (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        )
        for p in np.nonzero(inside)[0]:
            e_cam.append(c)
            e_pt.append(int(p))
            e_uv.append(uv[p])
    e_cam = np.asarray(e_cam, np.int32)
    e_pt = np.asarray(e_pt, np.int32)
    e_uv = np.asarray(e_uv)
    # perturb initial geometry
    cams0 = [cams_true[0]]
    for T in cams_true[1:]:
        xi = rng.normal(size=6) * 0.01
        cams0.append(np.asarray(se3.exp_se3(jnp.asarray(xi, jnp.float32)), np.float64) @ T)
    X0 = X + rng.normal(0, point_jitter, X.shape)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    return cams_true, cams0, fixed, X, X0, e_cam, e_pt, e_uv


class TestBundleAdjust:
    def test_converges_and_respects_fixed(self, rng):
        cams_true, cams0, fixed, X, X0, e_cam, e_pt, e_uv = make_ba_problem(rng)
        p = build_problem(
            np.stack(cams0).astype(np.float32), fixed, X0.astype(np.float32),
            e_cam, e_pt, e_uv.astype(np.float32), K,
        )
        T_out, X_out, chi = bundle_adjust(p, n_iters=20, robust=True)
        emask = np.ones(len(e_cam), bool)
        r0 = lm_oracle.reproj_rmse(cams0, X0, e_cam, e_pt, e_uv, emask, K)
        cams_out = [np.asarray(T_out[c], np.float64) for c in range(len(cams0))]
        r1 = lm_oracle.reproj_rmse(
            cams_out, np.asarray(X_out, np.float64), e_cam, e_pt, e_uv, emask, K
        )
        assert r1 < r0 * 0.5
        assert r1 < 0.8  # close to the noise floor
        np.testing.assert_array_equal(np.asarray(T_out[0]), p.cam_T[0])

    def test_parity_with_f64_oracle(self, rng):
        cams_true, cams0, fixed, X, X0, e_cam, e_pt, e_uv = make_ba_problem(
            rng, n_cams=3, n_pts=40
        )
        p = build_problem(
            np.stack(cams0).astype(np.float32), fixed, X0.astype(np.float32),
            e_cam, e_pt, e_uv.astype(np.float32), K,
        )
        T_out, X_out, _ = bundle_adjust(p, n_iters=15, robust=False)
        cams_ref, X_ref = lm_oracle.ba_lm(
            cams0, fixed, X0, e_cam, e_pt, e_uv,
            np.ones(len(e_cam)), K, 15, robust=False,
        )
        emask = np.ones(len(e_cam), bool)
        cams_out = [np.asarray(T_out[c], np.float64) for c in range(len(cams0))]
        r_jax = lm_oracle.reproj_rmse(
            cams_out, np.asarray(X_out, np.float64), e_cam, e_pt, e_uv, emask, K
        )
        r_ref = lm_oracle.reproj_rmse(cams_ref, X_ref, e_cam, e_pt, e_uv, emask, K)
        assert abs(r_jax - r_ref) < 1e-3, (r_jax, r_ref)

    def test_local_ba_flags_outliers(self, rng):
        cams_true, cams0, fixed, X, X0, e_cam, e_pt, e_uv = make_ba_problem(rng)
        # corrupt some observations
        out = rng.choice(len(e_cam), 15, replace=False)
        e_uv = e_uv.copy()
        e_uv[out] += rng.uniform(40, 100, (15, 2))
        p = build_problem(
            np.stack(cams0).astype(np.float32), fixed, X0.astype(np.float32),
            e_cam, e_pt, e_uv.astype(np.float32), K,
        )
        T_out, X_out, bad, chi = local_bundle_adjust(p)
        bad = np.asarray(bad)[: len(e_cam)]
        assert bad[out].all()
        assert bad.sum() < len(e_cam) * 0.25


class TestOctaveInformation:
    """Per-octave InvSigma2 information weights (upstream ORB-SLAM2 weighting
    restored; the fork used identity information at Optimizer.cc:141,265)."""

    def test_pose_parity_with_weighted_oracle(self, rng):
        T_true, T0, X, uv, _ = make_pose_problem(rng, noise=0.8)
        valid = np.ones(len(X), bool)
        octaves = rng.integers(0, 8, len(X))
        info = (1.2 ** (-2.0 * octaves)).astype(np.float64)
        T_opt, inlier, _ = pose_optimize(
            jnp.asarray(T0, jnp.float32),
            jnp.asarray(X, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            jnp.asarray(valid),
            jnp.asarray(K),
            jnp.asarray(info, jnp.float32),
        )
        T_ref, inlier_ref = lm_oracle.pose_optimize_oracle(
            T0, X, uv, valid, K, info=info
        )
        m = np.asarray(inlier) & inlier_ref
        r_jax = rmse_pose(np.asarray(T_opt), X, uv, m)
        r_ref = rmse_pose(T_ref, X, uv, m)
        assert abs(r_jax - r_ref) < 1e-3, (r_jax, r_ref)

    def test_weights_downweight_noisy_octaves(self, rng):
        # half the measurements carry octave-7-level noise; weighting must
        # recover a pose closer to truth than identity information
        T_true, T0, X, uv, _ = make_pose_problem(rng, noise=0.0)
        noisy = rng.random(len(X)) < 0.5
        uv = uv + rng.normal(0, 2.5, uv.shape) * noisy[:, None]
        info = np.where(noisy, 1.2 ** (-2.0 * 7), 1.0)
        valid = jnp.ones(len(X), bool)
        args = (
            jnp.asarray(T0, jnp.float32),
            jnp.asarray(X, jnp.float32),
            jnp.asarray(uv, jnp.float32),
            valid,
            jnp.asarray(K),
        )
        T_w, _, _ = pose_optimize(*args, jnp.asarray(info, jnp.float32))
        T_id, _, _ = pose_optimize(*args)
        err_w = np.abs(np.asarray(T_w, np.float64) - T_true).max()
        err_id = np.abs(np.asarray(T_id, np.float64) - T_true).max()
        assert err_w < err_id, (err_w, err_id)

    def test_ba_parity_with_weighted_oracle(self, rng):
        cams_true, cams0, fixed, X, X0, e_cam, e_pt, e_uv = make_ba_problem(
            rng, n_cams=3, n_pts=40
        )
        octaves = rng.integers(0, 8, len(e_cam))
        info = (1.2 ** (-2.0 * octaves)).astype(np.float64)
        p = build_problem(
            np.stack(cams0).astype(np.float32), fixed, X0.astype(np.float32),
            e_cam, e_pt, e_uv.astype(np.float32), K,
            e_info=info.astype(np.float32),
        )
        T_out, X_out, _ = bundle_adjust(p, n_iters=15, robust=False)
        cams_ref, X_ref = lm_oracle.ba_lm(
            cams0, fixed, X0, e_cam, e_pt, e_uv,
            np.ones(len(e_cam)), K, 15, robust=False, info=info,
        )
        emask = np.ones(len(e_cam), bool)
        cams_out = [np.asarray(T_out[c], np.float64) for c in range(len(cams0))]
        r_jax = lm_oracle.reproj_rmse(
            cams_out, np.asarray(X_out, np.float64), e_cam, e_pt, e_uv, emask, K
        )
        r_ref = lm_oracle.reproj_rmse(cams_ref, X_ref, e_cam, e_pt, e_uv, emask, K)
        assert abs(r_jax - r_ref) < 1e-3, (r_jax, r_ref)


class TestGlobalBACG:
    """Matrix-free PCG global BA (optim/bundle_adjust.py::global_bundle_adjust;
    the scalable LoopClosing GBA path, Optimizer.cc:62-215 at scale)."""

    def test_cg_parity_with_dense(self, rng):
        from mono_slam_framework_tpu.optim import global_bundle_adjust

        cams_true, cams0, fixed, X, X0, e_cam, e_pt, e_uv = make_ba_problem(rng)
        p = build_problem(
            np.stack(cams0).astype(np.float32), fixed, X0.astype(np.float32),
            e_cam, e_pt, e_uv.astype(np.float32), K,
        )
        T_d, X_d, _ = bundle_adjust(p, n_iters=20, robust=True)
        T_c, X_c, _ = global_bundle_adjust(p, n_iters=20, robust=True, cg_iters=80)
        emask = np.ones(len(e_cam), bool)
        r_d = lm_oracle.reproj_rmse(
            [np.asarray(T_d[c], np.float64) for c in range(len(cams0))],
            np.asarray(X_d, np.float64), e_cam, e_pt, e_uv, emask, K,
        )
        r_c = lm_oracle.reproj_rmse(
            [np.asarray(T_c[c], np.float64) for c in range(len(cams0))],
            np.asarray(X_c, np.float64), e_cam, e_pt, e_uv, emask, K,
        )
        # both land at the same noise floor; fixed camera bit-preserved
        assert r_c < 0.8 and abs(r_c - r_d) < 0.1, (r_c, r_d)
        np.testing.assert_array_equal(np.asarray(T_c[0]), p.cam_T[0])

    def test_cg_scales_without_pair_list(self, rng):
        """A 200-camera / 20k-point map: the dense path's pair list would
        hold ~sum(deg^2) entries and S would be [1200,1200] — the CG path
        never builds either and must still reduce the error."""
        from mono_slam_framework_tpu.optim import global_bundle_adjust

        n_cams, n_pts = 200, 20000
        X = np.stack(
            [
                rng.uniform(-30, 30, n_pts),
                rng.uniform(-2, 2, n_pts),
                rng.uniform(4, 10, n_pts),
            ],
            -1,
        )
        cams_true = []
        for c in range(n_cams):
            T = np.eye(4)
            T[:3, 3] = [-0.3 * c + rng.normal() * 0.01, 0, 0]
            cams_true.append(T)
        e_cam, e_pt, e_uv = [], [], []
        for c, T in enumerate(cams_true):
            Xc = X @ T[:3, :3].T + T[:3, 3]
            uv = (Xc[:, :2] / Xc[:, 2:]) * 500 + [320, 240]
            inside = (
                (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
            )
            # cap per-camera edges to keep the test fast but high-degree
            idx = np.nonzero(inside)[0][:300]
            for pt in idx:
                e_cam.append(c)
                e_pt.append(int(pt))
                e_uv.append(uv[pt] + rng.normal(0, 0.3, 2))
        assert len(e_cam) > 30000
        cams0 = [cams_true[0]]
        for T in cams_true[1:]:
            xi = rng.normal(size=6) * 0.005
            cams0.append(
                np.asarray(se3.exp_se3(jnp.asarray(xi, jnp.float32)), np.float64) @ T
            )
        X0 = X + rng.normal(0, 0.03, X.shape)
        fixed = np.zeros(n_cams, bool)
        fixed[0] = True

        p = build_problem(
            np.stack(cams0).astype(np.float32), fixed, X0.astype(np.float32),
            np.asarray(e_cam, np.int32), np.asarray(e_pt, np.int32),
            np.asarray(e_uv, np.float32), K, with_pairs=False,
        )
        assert p.pair_i.shape[0] <= 2  # no quadratic pair list was built
        T_out, X_out, chi = global_bundle_adjust(
            p, n_iters=6, robust=False, cg_iters=40
        )
        emask = np.ones(len(e_cam), bool)
        cams_out = [np.asarray(T_out[c], np.float64) for c in range(n_cams)]
        r0 = lm_oracle.reproj_rmse(
            cams0, X0, np.asarray(e_cam), np.asarray(e_pt), np.asarray(e_uv),
            emask, K,
        )
        r1 = lm_oracle.reproj_rmse(
            cams_out, np.asarray(X_out, np.float64), np.asarray(e_cam),
            np.asarray(e_pt), np.asarray(e_uv), emask, K,
        )
        assert np.isfinite(r1)
        assert r1 < r0 * 0.5, (r0, r1)
