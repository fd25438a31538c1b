"""Pose-graph (essential-graph) loop distribution (optim/pose_graph.py).

The reference fork dropped upstream's OptimizeEssentialGraph
(LoopClosing.cc:101-115 runs a bare global BA); this pins the rebuilt
capability: a loop-closure discrepancy is distributed around the whole
chain, recovering the true trajectory from drifted estimates."""

import numpy as np

from mono_slam_framework_tpu.geometry import sim3 as s3
from mono_slam_framework_tpu.optim.pose_graph import optimize_pose_graph_np


def _se3(R, t):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def _square_truth(n_side=6, step=0.5):
    """World->camera poses walking a square in x-y, facing +z."""
    centers = []
    x = y = 0.0
    for dx, dy in ((step, 0), (0, step), (-step, 0), (0, -step)):
        for _ in range(n_side):
            centers.append((x, y))
            x += dx
            y += dy
    poses = []
    for cx, cy in centers:
        poses.append(_se3(np.eye(3), [-cx, -cy, 0.0]))
    return poses


class TestPoseGraph:
    def _drift(self, truth, rng, per_step=0.04):
        """Re-integrate the chain with biased relative-pose errors (drift)."""
        drifted = [truth[0]]
        bias = rng.normal(size=3) * per_step
        for k in range(1, len(truth)):
            rel = truth[k] @ np.linalg.inv(truth[k - 1])
            rel = rel.copy()
            rel[:3, 3] += bias + rng.normal(size=3) * 0.002
            drifted.append((rel @ drifted[-1]).astype(np.float32))
        return drifted

    def test_loop_distribution_recovers_truth(self):
        rng = np.random.default_rng(0)
        truth = _square_truth()
        drifted = self._drift(truth, rng)
        n = len(truth)
        # sequential edges measured from the DRIFTED estimates (what
        # tracking believed), loop edge from the true closure
        e_i, e_j, T_meas, w = [], [], [], []
        for k in range(1, n):
            e_i.append(k)
            e_j.append(k - 1)
            T_meas.append(drifted[k] @ np.linalg.inv(drifted[k - 1]))
            w.append(1.0)
        e_i.append(n - 1)
        e_j.append(0)
        T_meas.append(truth[n - 1] @ np.linalg.inv(truth[0]))
        w.append(5.0)
        fixed = np.zeros(n, bool)
        fixed[0] = True

        def ate(poses):
            est = np.stack([-p[:3, :3].T @ p[:3, 3] for p in poses])
            gt = np.stack([-p[:3, :3].T @ p[:3, 3] for p in truth])
            return float(np.sqrt(((est - gt) ** 2).sum(1).mean()))

        before = ate(drifted)
        T_opt = optimize_pose_graph_np(
            np.stack(drifted), fixed, e_i, e_j, np.stack(T_meas), w
        )
        after = ate(list(T_opt))
        assert before > 0.3, before  # the drift is material
        assert after < 0.35 * before, (before, after)
        # gauge anchor untouched
        np.testing.assert_allclose(T_opt[0], drifted[0], atol=1e-5)

    def test_consistent_graph_is_fixed_point(self):
        truth = _square_truth(n_side=3)
        n = len(truth)
        e_i = list(range(1, n))
        e_j = list(range(0, n - 1))
        T_meas = [truth[k] @ np.linalg.inv(truth[k - 1]) for k in range(1, n)]
        fixed = np.zeros(n, bool)
        fixed[0] = True
        T_opt = optimize_pose_graph_np(
            np.stack(truth), fixed, e_i, e_j, np.stack(T_meas), None
        )
        for a, b in zip(T_opt, truth):
            np.testing.assert_allclose(a, b, atol=1e-4)

    def test_rotation_drift(self):
        rng = np.random.default_rng(3)
        truth = _square_truth()
        n = len(truth)
        # rotational drift: each step slightly over-rotates about y
        drifted = [truth[0]]
        for k in range(1, n):
            rel = truth[k] @ np.linalg.inv(truth[k - 1])
            Rz = s3.exp_so3(np.array([0.0, 0.004, 0.0]))
            rel = rel.copy()
            rel[:3, :3] = Rz @ rel[:3, :3]
            drifted.append((rel @ drifted[-1]).astype(np.float32))
        e_i = list(range(1, n)) + [n - 1]
        e_j = list(range(0, n - 1)) + [0]
        T_meas = [drifted[k] @ np.linalg.inv(drifted[k - 1]) for k in range(1, n)]
        T_meas.append(truth[n - 1] @ np.linalg.inv(truth[0]))
        w = [1.0] * (n - 1) + [5.0]
        fixed = np.zeros(n, bool)
        fixed[0] = True
        T_opt = optimize_pose_graph_np(
            np.stack(drifted), fixed, e_i, e_j, np.stack(T_meas), w
        )

        def ate(poses):
            est = np.stack([-p[:3, :3].T @ p[:3, 3] for p in poses])
            gt = np.stack([-p[:3, :3].T @ p[:3, 3] for p in truth])
            return float(np.sqrt(((est - gt) ** 2).sum(1).mean()))

        assert ate(list(T_opt)) < 0.5 * ate(drifted)
