"""End-to-end pipeline integration test on a synthetic sequence
(SURVEY.md §4d — the reference's implicit Webots harness, made automatic).

Uses a two-plane world: a single perfect plane is the degenerate case for
monocular two-view initialization (homography ambiguity lets BA slide the
baseline), which the reference "solves" operationally via its manual
initialization gate. The planar case is covered by a smoke test.
"""

import numpy as np
import pytest

from mono_slam_framework_tpu.params import SlamParameters
from mono_slam_framework_tpu.matchers import OrbFeatureMatcher
from mono_slam_framework_tpu.slam import System, KeyFrameMatchDatabase
from mono_slam_framework_tpu.slam.frame import reset_frame_ids
from mono_slam_framework_tpu.slam.map_model import reset_map_ids
from mono_slam_framework_tpu.slam.tracking import TrackingState
from mono_slam_framework_tpu.io import trajectory

from synthetic_world import PlaneWorld, lateral_trajectory


@pytest.fixture
def world():
    return PlaneWorld(second_plane=(3.0, 0.3))


def build_system(world, verbose=False, **overrides):
    reset_frame_ids()
    reset_map_ids()
    # minIniMatchCount=100 (upstream ORB-SLAM2's monocular value): the
    # reference default of 25 accepts geometrically weak init pairs, which
    # its operator-controlled manual gate compensates for interactively.
    # Model fallback makes initialization deterministic on this scene.
    params = SlamParameters(
        fx=world.f,
        fy=world.f,
        cx=world.cx,
        cy=world.cy,
        max_features=400,
        minIniMatchCount=100,
        initializerModelFallback=True,
        **overrides,
    )
    matcher = OrbFeatureMatcher(threshold=0.7, max_features=400)
    kf_db = KeyFrameMatchDatabase(matcher)
    return System(params, matcher, kf_db, verbose=verbose)


def run_sequence(system, world, poses, t0=0.0):
    states = []
    for i, T in enumerate(poses):
        system.track_monocular(world.render(T), timestamp=t0 + i * 0.1)
        states.append(system.tracker.state)
    return states


class TestPipeline:
    def test_tracks_synthetic_sequence(self, world, tmp_path):
        n_frames = 28
        poses = lateral_trajectory(n_frames, step=0.07)
        system = build_system(world)
        system.toggle_initialization_allowed()
        states = run_sequence(system, world, poses)

        # initialization happens once baseline is sufficient, then holds
        assert TrackingState.OK in states
        first_ok = states.index(TrackingState.OK)
        ok_after = sum(s == TrackingState.OK for s in states[first_ok:])
        assert ok_after >= (n_frames - first_ok) - 4, [s.name for s in states]
        assert system.map.n_keyframes() >= 2
        assert system.map.n_map_points() > 50

        # export + evaluate trajectory vs ground truth
        traj_path = tmp_path / "kf_traj.txt"
        system.save_keyframe_trajectory_tum(str(traj_path))
        t_est, p_est, q_est = trajectory.read_tum(str(traj_path))
        assert len(t_est) >= 2
        gt_t = np.array([i * 0.1 for i in range(n_frames)])
        gt_p = np.stack([-(T[:3, :3].T @ T[:3, 3]) for T in poses])
        ate, n_assoc = trajectory.ate_rmse(t_est, p_est, gt_t, gt_p)
        assert n_assoc >= 2
        # Early-map fidelity: scale-aligned ATE over the first tracked frames
        # must be tight (per-frame trajectory via the full-frame export, an
        # upstream-ORB-SLAM2 API the fork dropped). Full-trajectory ATE is
        # tight too since the round-2 SO(3) projection fix (the round-1
        # "scale drift" was exponential off-manifold decay of float32 pose
        # compositions, killed by se3.orthonormalize after every pose/BA
        # optimization; measured 0.40 -> 0.043 on this sequence).
        frame_traj = tmp_path / "frames.txt"
        system.save_trajectory_tum(str(frame_traj))
        t_fr, p_fr, _ = trajectory.read_tum(str(frame_traj))
        assert len(t_fr) >= 12
        k = min(12, len(t_fr))
        ate_early, n_early = trajectory.ate_rmse(t_fr[:k], p_fr[:k], gt_t, gt_p)
        assert n_early >= 6
        assert ate_early < 0.05, ate_early
        assert ate < 0.15, ate

        # public API surface
        assert system.get_current_position() is not None
        img = system.get_current_match_image()
        assert img.ndim == 3 and img.shape[2] == 3
        metrics = system.last_metrics
        assert metrics["state"] == states[-1].name

        # ---- checkpoint roundtrip on the tracked map ----
        n_kf = system.map.n_keyframes()
        n_mp = system.map.n_map_points()
        path = str(tmp_path / "map.npz")
        system.save_checkpoint(path)
        system2 = build_system(world)
        system2.load_checkpoint(path)
        assert system2.map.n_keyframes() == n_kf
        # bad-flag cascades during reload may cull weak points, but the bulk
        # of the map must survive
        assert system2.map.n_map_points() >= 0.8 * n_mp
        kf_l = sorted(system2.map.all_keyframes(), key=lambda k: k.id)[0]
        kf_o = sorted(system.map.all_keyframes(), key=lambda k: k.id)[0]
        np.testing.assert_allclose(kf_l.Tcw, kf_o.Tcw, atol=1e-6)
        assert kf_l.keypoint_map.size > 0

        # ---- reset clears everything ----
        system.reset()
        assert system.map.n_map_points() == 0
        assert system.map.n_keyframes() == 0
        assert system.tracker.state == TrackingState.NO_IMAGES_YET
        assert len(system.kf_db.frames) == 0

    def test_planar_world_smoke(self):
        # pure plane: init must still happen via the homography path
        world = PlaneWorld(second_plane=None)
        poses = lateral_trajectory(26, step=0.1)
        system = build_system(world)
        system.toggle_initialization_allowed()
        states = run_sequence(system, world, poses)
        assert TrackingState.OK in states
        assert system.map.n_map_points() > 50

    def test_initialization_gate(self, world):
        poses = lateral_trajectory(6, step=0.1)
        system = build_system(world)
        # gate NOT toggled: must never initialize
        run_sequence(system, world, poses)
        assert system.map.n_map_points() == 0
        assert system.tracker.state == TrackingState.NOT_INITIALIZED


