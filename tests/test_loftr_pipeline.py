"""End-to-end pipeline test driving System with the DNN (LoFTR) matcher.

The reference's reason to exist is swapping matchers under one pipeline, and
it ships a live LoFTR configuration (src/main.cpp:63-66 constructs
DNNFeatureMatcher with threshold 0.1 and passes it into System at
main.cpp:78-82). This test proves the same swap here: the full
init -> tracking -> keyframe growth flow with 16 px coarse-cell integer
correspondences (dnnfeaturematcher.cpp:75-100 decode) surviving
initialization, triangulation, and BA.

Match precision note: LoFTR cells decode to 16 px corners, so the matcher
reports its effective measurement sigma through the octave/InvSigma2
channel (~8 px coarse, ~2 px with the fine stage); the optimizers then gate
inliers at the matcher's real precision instead of ORB's ~1 px.
"""

import numpy as np
import pytest

from mono_slam_framework_tpu.params import SlamParameters
from mono_slam_framework_tpu.matchers.loftr_matcher import LoftrFeatureMatcher
from mono_slam_framework_tpu.slam import System, KeyFrameMatchDatabase
from mono_slam_framework_tpu.slam.frame import reset_frame_ids
from mono_slam_framework_tpu.slam.map_model import reset_map_ids
from mono_slam_framework_tpu.slam.tracking import TrackingState
from mono_slam_framework_tpu.io import trajectory

from synthetic_world import PlaneWorld, lateral_trajectory


def build_loftr_system(world, fine: bool, fused: bool = True):
    reset_frame_ids()
    reset_map_ids()
    params = SlamParameters(
        fx=world.f,
        fy=world.f,
        cx=world.cx,
        cy=world.cy,
        minIniMatchCount=60,
        initializerModelFallback=True,
        fusedTracking=fused,
        fusedOneStep=fused,
    )
    # threshold 0.1 = the reference's live DNN configuration (main.cpp:63)
    matcher = LoftrFeatureMatcher(threshold=0.1, fine=fine)
    kf_db = KeyFrameMatchDatabase(matcher)
    return System(params, matcher, kf_db, verbose=False)


def _run_and_export(system, world, poses, tmp_path, tag):
    system.toggle_initialization_allowed()
    states = []
    for i, T in enumerate(poses):
        system.track_monocular(world.render(T), timestamp=i * 0.1)
        states.append(system.tracker.state)
    p = tmp_path / f"{tag}.txt"
    system.save_trajectory_tum(str(p))
    return states, trajectory.read_tum(str(p))


@pytest.fixture(scope="module")
def loftr_run():
    """One shared 10-frame LoFTR (fine) run — the expensive fixture."""
    world = PlaneWorld(width=640, height=480, f=500.0, second_plane=(3.0, 0.3))
    n = 10
    poses = lateral_trajectory(n, step=0.12)
    system = build_loftr_system(world, fine=True)
    system.toggle_initialization_allowed()
    states = []
    for i, T in enumerate(poses):
        system.track_monocular(world.render(T), timestamp=i * 0.1)
        states.append(system.tracker.state)
    return system, states, poses


class TestLoftrPipeline:
    def test_init_ok_and_keyframe_growth(self, loftr_run):
        system, states, _ = loftr_run
        # initializes within the first two frames, then never loses tracking
        assert states[1] == TrackingState.OK or states[2] == TrackingState.OK
        first_ok = states.index(TrackingState.OK)
        assert all(s == TrackingState.OK for s in states[first_ok:]), [
            s.name for s in states
        ]
        # the map grows past the two init keyframes (triangulation + BA
        # survive the coarse-cell measurements)
        assert system.map.n_keyframes() >= 4
        assert system.map.n_map_points() > 200

    def test_trajectory_quality(self, loftr_run, tmp_path):
        system, _, poses = loftr_run
        p = tmp_path / "frames.txt"
        system.save_trajectory_tum(str(p))
        t_fr, p_fr, _ = trajectory.read_tum(str(p))
        gt_t = np.array([i * 0.1 for i in range(len(poses))])
        gt_p = np.stack([-(T[:3, :3].T @ T[:3, 3]) for T in poses])
        ate, n_assoc = trajectory.ate_rmse(t_fr, p_fr, gt_t, gt_p)
        assert n_assoc >= 6
        # 16 px cells + fine refinement: looser than the ORB bound (0.15)
        # but must stay subordinate to the 1.2-unit trajectory span
        assert ate < 0.2, ate

    def test_fused_steady_matches_unfused(self, tmp_path):
        """The one-program LoFTR steady path (slam/fused_loftr.py) against
        the unfused reference-twin flow: same coarse configuration, same
        sequence — tracking states agree and the trajectories match to well
        under the measurement scale (pairwise scale-aligned ATE)."""
        world = PlaneWorld(width=640, height=480, f=500.0, second_plane=(3.0, 0.3))
        poses = lateral_trajectory(8, step=0.12)

        sys_u = build_loftr_system(world, fine=False, fused=False)
        st_u, (t_u, p_u, _) = _run_and_export(sys_u, world, poses, tmp_path, "u")
        sys_f = build_loftr_system(world, fine=False, fused=True)
        st_f, (t_f, p_f, _) = _run_and_export(sys_f, world, poses, tmp_path, "f")

        assert [s.name for s in st_f] == [s.name for s in st_u]
        assert TrackingState.OK in st_f
        assert sys_f.map.n_keyframes() >= 2
        # fused-vs-unfused trajectory agreement (same bound family as the
        # ORB parity tests in test_fused.py)
        ate_pair, n = trajectory.ate_rmse(t_f, p_f, t_u, p_u)
        assert n >= 5
        assert ate_pair < 0.06, ate_pair

    def test_pipelined_loftr(self, tmp_path):
        """Fast-mode symmetry (the DNN matcher is a drop-in plugin,
        dnnfeaturematcher.cpp:44-102): track_monocular_pipelined engages the
        speculative LoFTR dispatch (slam/fused_loftr.py spec machinery) and
        the trajectory stays within tolerance of ground truth."""
        from mono_slam_framework_tpu.slam import fused_host

        world = PlaneWorld(width=640, height=480, f=500.0, second_plane=(3.0, 0.3))
        poses = lateral_trajectory(8, step=0.12)
        system = build_loftr_system(world, fine=False, fused=True)
        system.toggle_initialization_allowed()
        for i, T in enumerate(poses):
            system.track_monocular_pipelined(world.render(T), i * 0.1)
        system.flush_pipeline()

        assert system.tracker.state == TrackingState.OK
        stats = fused_host.pipe_stats(system.tracker)
        assert stats.get("dispatch", 0) >= 2, stats
        assert stats.get("hit", 0) >= 2, stats

        p = tmp_path / "loftr_pipe.txt"
        system.save_trajectory_tum(str(p))
        t_v, p_v, _ = trajectory.read_tum(str(p))
        gt_t = np.array([i * 0.1 for i in range(len(poses))])
        gt_p = np.stack([-(T[:3, :3].T @ T[:3, 3]) for T in poses])
        ate, n = trajectory.ate_rmse(t_v, p_v, gt_t, gt_p)
        assert n >= 5
        assert ate < 0.2, ate
