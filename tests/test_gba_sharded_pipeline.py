"""Pipeline-level test of the mesh-sharded global BA route.

VERDICT round-2 #7: `parallel/ba_sharded.py` was unit-tested but never
exercised through the loop-closing pipeline. Here a >24-keyframe map (the
`GLOBAL_BA_DENSE_MAX_CAMS` switch point, slam/device_io.py) is driven
through LoopClosing.run_global_bundle_adjustment on the 8-device CPU mesh
and the test asserts (a) the sharded route actually ran, (b) its staged
results + spanning-tree propagation were applied, and (c) the corrected
poses match the single-device solver's on the identical problem.

Reference twin: Optimizer.cc:62-215 (GlobalBundleAdjustemnt) at scale,
invoked from LoopClosing.cc:122-199.
"""

import numpy as np
import pytest

import mono_slam_framework_tpu.parallel as parallel_pkg
from mono_slam_framework_tpu.params import SlamParameters
from mono_slam_framework_tpu.slam import device_io
from mono_slam_framework_tpu.slam.frame import Frame, reset_frame_ids
from mono_slam_framework_tpu.slam.loop_closing import LoopClosing
from mono_slam_framework_tpu.slam.map_model import (
    KeyFrame,
    Map,
    MapPoint,
    reset_map_ids,
)

N_KF = 28  # > GLOBAL_BA_DENSE_MAX_CAMS (24) -> PCG / sharded route
N_PT = 240
IMG_W, IMG_H = 64, 48
K = np.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1]], np.float32)


def _build_map(seed=0):
    """Deterministic >24-KF map: cameras on a line viewing a 3D slab, GT
    observations with small noise, poses/points perturbed so BA has work."""
    reset_frame_ids()
    reset_map_ids()
    rng = np.random.default_rng(seed)
    m = Map()

    pts_gt = np.stack(
        [
            rng.uniform(-3, 6, N_PT),
            rng.uniform(-2, 2, N_PT),
            rng.uniform(5, 8, N_PT),
        ],
        axis=-1,
    ).astype(np.float32)

    img = np.zeros((IMG_H, IMG_W), np.float32)
    kfs = []
    for i in range(N_KF):
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, 3] = [-0.12 * i, 0.01 * (i % 3), 0.0]
        frame = Frame(img, timestamp=i * 0.1, K=K)
        T_init = T_gt.copy()
        if i > 0:  # KF0 is the fixed gauge anchor
            T_init[:3, 3] += rng.normal(0, 0.02, 3).astype(np.float32)
        frame.set_pose(T_init)
        kf = KeyFrame(frame, m, kf_db=None)
        kf.T_gt = T_gt
        m.add_keyframe(kf)
        kfs.append(kf)
        if i > 0:
            kf.parent = kfs[i - 1]
            kfs[i - 1].children.add(kf)
    m.keyframe_origins.append(kfs[0])

    for j in range(N_PT):
        X = pts_gt[j]
        mp = MapPoint(X + rng.normal(0, 0.03, 3).astype(np.float32), kfs[0], m)
        n_obs = 0
        for kf in kfs:
            Xc = kf.T_gt[:3, :3] @ X + kf.T_gt[:3, 3]
            if Xc[2] <= 0.1:
                continue
            u = K[0, 0] * Xc[0] / Xc[2] + K[0, 2]
            v = K[1, 1] * Xc[1] / Xc[2] + K[1, 2]
            if not (0 <= u < IMG_W and 0 <= v < IMG_H):
                continue
            uv = (
                float(u + rng.normal(0, 0.3)),
                float(v + rng.normal(0, 0.3)),
            )
            mp.add_observation(kf, (int(uv[0]), int(uv[1])), measurement=uv)
            n_obs += 1
        if n_obs >= 3:
            m.add_map_point(mp)
    return m, kfs


def _loop_closer(m):
    params = SlamParameters(fx=60.0, fy=60.0, cx=32.0, cy=24.0)
    return LoopClosing(m, kf_db=None, feature_matcher=None, params=params,
                       verbose=False)


class TestShardedGBAPipeline:
    def test_loop_gba_routes_through_sharded_and_matches_single_device(
        self, monkeypatch
    ):
        import jax

        assert len(jax.devices()) > 1  # the 8-device CPU mesh (conftest)

        # ---- run A: real sharded route, with a spy ----
        calls = []
        real = parallel_pkg.global_bundle_adjust_sharded

        def spy(mesh, p, **kw):
            calls.append(p.cam_T.shape[0])
            return real(mesh, p, **kw)

        monkeypatch.setattr(parallel_pkg, "global_bundle_adjust_sharded", spy)
        m_a, kfs_a = _build_map()
        loop_kf_id = kfs_a[-1].id
        _loop_closer(m_a).run_global_bundle_adjustment(loop_kf_id)

        # the sharded route ran, over the full >24-camera problem
        assert calls, "sharded GBA was not invoked for a >24-KF loop GBA"
        assert calls[0] >= N_KF
        # staged results + spanning-tree propagation applied everywhere
        for kf in kfs_a:
            assert kf.ba_global_for_kf == loop_kf_id
            assert kf.Tcw_bef_gba is not None
            R = kf.get_pose()[:3, :3]
            assert np.abs(R @ R.T - np.eye(3)).max() < 1e-4
        assert m_a.get_last_big_change_idx() > 0

        # ---- run B: identical problem through the single-device solver ----
        from mono_slam_framework_tpu.optim import global_bundle_adjust

        def single(mesh, p, **kw):
            return global_bundle_adjust(p, **kw)

        monkeypatch.setattr(parallel_pkg, "global_bundle_adjust_sharded", single)
        m_b, kfs_b = _build_map()
        _loop_closer(m_b).run_global_bundle_adjustment(kfs_b[-1].id)

        # sharded and single-device pipelines agree on the corrected poses
        for ka, kb in zip(kfs_a, kfs_b):
            np.testing.assert_allclose(
                ka.get_pose(), kb.get_pose(), atol=5e-3
            )
        # and BA actually improved the perturbed trajectory vs ground truth
        err_before = np.mean(
            [np.linalg.norm(kf.Tcw_bef_gba[:3, 3] - kf.T_gt[:3, 3]) for kf in kfs_a]
        )
        err_after = np.mean(
            [np.linalg.norm(kf.get_pose()[:3, 3] - kf.T_gt[:3, 3]) for kf in kfs_a]
        )
        assert err_after < err_before
