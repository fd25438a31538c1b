"""Sim(3) exp/log/power used by the loop-closure pre-alignment
(geometry/sim3.py; upstream ORB-SLAM2 CorrectLoop heritage — the reference
fork has no Sim3 path, SURVEY.md §0.5)."""

import numpy as np
import pytest

from mono_slam_framework_tpu.geometry import sim3


def rand_sim3(rng, max_angle=2.5, max_logs=0.6):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rng.uniform(0, max_angle)
    R = sim3.exp_so3(w)
    s = float(np.exp(rng.uniform(-max_logs, max_logs)))
    t = rng.normal(size=3)
    return s, R, t


class TestSO3:
    @pytest.mark.parametrize("theta", [0.0, 1e-9, 1e-5, 0.3, 2.0, np.pi - 1e-4])
    def test_roundtrip(self, theta):
        rng = np.random.default_rng(int(theta * 1e6) % 2**31)
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        R = sim3.exp_so3(axis * theta)
        w = sim3.log_so3(R)
        R2 = sim3.exp_so3(w)
        assert np.abs(R2 - R).max() < 1e-6, theta


class TestSim3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(30):
            s, R, t = rand_sim3(rng)
            sig, w, u = sim3.log_sim3(s, R, t)
            s2, R2, t2 = sim3.exp_sim3(sig, w, u)
            assert abs(s2 - s) < 1e-8 * max(1.0, s)
            assert np.abs(R2 - R).max() < 1e-8
            assert np.abs(t2 - t).max() < 1e-7

    def test_small_angle_and_scale(self):
        # the epsilon-guarded branches of _sim3_W
        for sig in (0.0, 1e-10, 0.3):
            for th in (0.0, 1e-10, 1e-6):
                w = np.array([th, 0.0, 0.0])
                t = np.array([1.0, -2.0, 0.5])
                s, R, t2 = sim3.exp_sim3(
                    sig, w, np.linalg.solve(sim3._sim3_W(sig, w), t)
                )
                assert np.isfinite(t2).all()
                assert np.abs(t2 - t).max() < 1e-6

    def test_power_composes(self):
        rng = np.random.default_rng(1)
        s, R, t = rand_sim3(rng)
        sh, Rh, th = sim3.sim3_power(s, R, t, 0.5)
        # G^0.5 ∘ G^0.5 == G (sim3 composition)
        s2 = sh * sh
        R2 = Rh @ Rh
        t2 = sh * (Rh @ th) + th
        assert abs(s2 - s) < 1e-8
        assert np.abs(R2 - R).max() < 1e-8
        assert np.abs(t2 - t).max() < 1e-7

    def test_power_endpoints(self):
        rng = np.random.default_rng(2)
        s, R, t = rand_sim3(rng)
        s0, R0, t0 = sim3.sim3_power(s, R, t, 0.0)
        assert s0 == 1.0 and np.abs(R0 - np.eye(3)).max() == 0.0
        s1, R1, t1 = sim3.sim3_power(s, R, t, 1.0)
        assert abs(s1 - s) < 1e-12 and np.abs(t1 - t).max() < 1e-12


class TestFitSim3Robust:
    def _pairs(self, rng, s, R, t, n=40, noise=0.0):
        new = rng.normal(size=(n, 3)) * 1.5 + [0, 0, 5]
        old = sim3.apply_sim3(s, R, t, new)
        if noise:
            old = old + rng.normal(size=old.shape) * noise
        return new, old

    def test_clean_recovery(self):
        rng = np.random.default_rng(10)
        s, R, t = 1.12, sim3.exp_so3(np.array([0.02, -0.05, 0.03])), np.array(
            [0.6, -0.2, 0.1]
        )
        new, old = self._pairs(rng, s, R, t, noise=0.002)
        fs, fR, ft = sim3.fit_sim3_robust(new, old)
        assert abs(fs - s) < 0.01
        assert np.abs(fR - R).max() < 0.01
        assert np.abs(ft - t).max() < 0.02

    def test_outlier_tolerance(self):
        rng = np.random.default_rng(11)
        s, R, t = 0.95, np.eye(3), np.array([-0.4, 0.8, 0.0])
        new, old = self._pairs(rng, s, R, t, n=40, noise=0.005)
        # 25% wild outliers (false duplicate matches)
        old[:10] = rng.normal(size=(10, 3)) * 4.0
        fs, fR, ft = sim3.fit_sim3_robust(new, old)
        assert abs(fs - s) < 0.05
        assert np.abs(ft - t).max() < 0.1

    def test_degenerate_matches_fall_back_to_translation(self):
        """Uncorrelated matches collapse the closed-form Umeyama scale
        toward 0 (measured 0.006 on a real loop before the gates); the
        robust fit must degrade to a sane model, never a map-crushing one."""
        rng = np.random.default_rng(12)
        new = rng.normal(size=(20, 3)) * 1.5 + [0, 0, 5]
        # old points: same cloud shifted, but pairing SCRAMBLED (all matches
        # wrong) -> cross-covariance ~0
        perm = rng.permutation(20)
        old = new[perm] + [1.0, 0.0, 0.0]
        fit = sim3.fit_sim3_robust(new, old)
        if fit is not None:
            fs, fR, ft = fit
            assert 0.5 <= fs <= 2.0
            assert sim3.rotation_angle(fR) <= 0.6

    def test_no_improvement_returns_none(self):
        rng = np.random.default_rng(13)
        new = rng.normal(size=(12, 3))
        old = rng.normal(size=(12, 3)) * 0.01  # clustered: nothing helps
        fit = sim3.fit_sim3_robust(new, old)
        # either skipped outright or a gated model that genuinely improves
        if fit is not None:
            res0 = np.median(np.linalg.norm(old - new, axis=1))
            res = np.median(
                np.linalg.norm(sim3.apply_sim3(*fit, new) - old, axis=1)
            )
            assert res < res0

    def test_few_pairs_returns_none(self):
        assert sim3.fit_sim3_robust(np.zeros((3, 3)), np.ones((3, 3))) is None


class TestCorrectedPose:
    def test_projection_invariance(self):
        """Correcting the world by G and the pose by corrected_pose leaves
        image projections unchanged (up to the uniform depth rescale)."""
        rng = np.random.default_rng(3)
        s, R, t = rand_sim3(rng, max_angle=1.0)
        wk = rng.normal(size=3) * 0.4
        Tcw = np.eye(4)
        Tcw[:3, :3] = sim3.exp_so3(wk)
        Tcw[:3, 3] = rng.normal(size=3)
        X = rng.normal(size=(50, 3)) + [0, 0, 6]
        xc = X @ Tcw[:3, :3].T + Tcw[:3, 3]
        Xc = sim3.apply_sim3(s, R, t, X)
        Tp = sim3.corrected_pose(Tcw, s, R, t)
        xc2 = Xc @ Tp[:3, :3].T + Tp[:3, 3]
        # same ray directions, depths scaled by s
        np.testing.assert_allclose(xc2, s * xc, rtol=1e-6, atol=1e-6)
        # corrected pose stays SE(3)
        Rp = Tp[:3, :3]
        assert np.abs(Rp @ Rp.T - np.eye(3)).max() < 1e-6
