"""Relocalization and loop-closing integration tests (SURVEY.md §3.4, §3.5;
BASELINE.json configs: EuRoC reloc path analog)."""

import numpy as np
import pytest

from mono_slam_framework_tpu.slam.tracking import TrackingState

from synthetic_world import PlaneWorld, lateral_trajectory
from test_pipeline import build_system, run_sequence


@pytest.fixture
def world():
    return PlaneWorld(second_plane=(3.0, 0.3))


class TestRelocalization:
    def test_relocalize_after_dropout(self, world):
        poses = lateral_trajectory(28, step=0.07)
        system = build_system(world)
        system.toggle_initialization_allowed()
        system.set_minimum_keyframes(0)  # public knob (System.h:SetMinimumKeyFrames)
        states = run_sequence(system, world, poses)
        assert states[-1] == TrackingState.OK
        n_kf = system.map.n_keyframes()
        assert n_kf >= 2
        revisit_pose = system.tracker.current_frame.get_pose().copy()

        # sensor dropout: three flat frames -> LOST (no reset: KFs > minimum)
        for j in range(3):
            system.track_monocular(
                np.full((world.h, world.w), 128.0, np.float32), 3.0 + j * 0.1
            )
        assert system.tracker.state == TrackingState.LOST
        assert system.map.n_keyframes() == n_kf  # map survived

        # revisit the last tracked view -> relocalization via the KF database
        system.track_monocular(world.render(poses[-1]), 4.0)
        assert system.tracker.state == TrackingState.OK
        reloc_pose = system.tracker.current_frame.get_pose()
        # recovered pose close to the pre-dropout pose of the same view
        assert np.abs(reloc_pose - revisit_pose).max() < 0.05
        assert system.tracker.last_reloc_frame_id == system.tracker.current_frame.id


class TestLoopClosing:
    def test_out_and_back_triggers_loop(self, world):
        # out-and-back: revisiting the start must eventually fire DetectLoop
        out = lateral_trajectory(26, step=0.07)
        back = out[::-1]
        system = build_system(world)
        system.toggle_initialization_allowed()
        states = run_sequence(system, world, out)
        assert TrackingState.OK in states
        t0 = 2.6
        for i, T in enumerate(back):
            system.track_monocular(world.render(T), t0 + i * 0.1)
        # the loop-closing queue processed keyframes into the database
        assert len(system.kf_db.frames) > 0
        # map remains healthy after the return pass
        assert system.tracker.state == TrackingState.OK
        assert system.map.n_keyframes() >= 2
        if system.loop_closer.last_loop_kf_id > 0:
            # loop fired: global BA ran and flagged the big change
            assert system.map_changed()
