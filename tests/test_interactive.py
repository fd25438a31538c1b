"""Interactive teleop driver: scripted-session coverage.

The reference's application loop is keyboard-driven (src/main.cpp:142-175:
side-by-side match display + arrow-key teleop + 'I' init gate). The rebuild's
`interactive.run_interactive` replays a scripted key stream deterministically;
this test drives a full session: init gate toggle -> teleop motion ->
initialization -> steady tracking -> trajectory save -> quit.
"""

import os

import numpy as np
import pytest

from mono_slam_framework_tpu.interactive import Rig, _ansi_preview, run_interactive
from mono_slam_framework_tpu.matchers import OrbFeatureMatcher
from mono_slam_framework_tpu.params import SlamParameters
from mono_slam_framework_tpu.sim import PlaneWorld
from mono_slam_framework_tpu.slam import KeyFrameMatchDatabase, System
from mono_slam_framework_tpu.slam.frame import reset_frame_ids
from mono_slam_framework_tpu.slam.map_model import reset_map_ids


def test_rig_teleop_kinematics():
    rig = Rig(impulse=0.1, damping=0.5)
    assert rig.key("right") and rig.key("up")
    rig.tick()
    assert rig.pos[0] > 0 and rig.pos[1] > 0
    # velocity decays: a second tick moves less than the first
    p1 = rig.pos.copy()
    rig.tick()
    assert np.all(np.abs(rig.pos - p1) < np.abs(p1) + 1e-12)
    rig.key("space")
    p2 = rig.pos.copy()
    rig.tick()
    np.testing.assert_allclose(rig.pos, p2)
    # yaw keys rotate the pose
    assert rig.key("c")
    rig.tick()
    T = rig.tcw()
    assert abs(T[0, 2]) > 0  # off-diagonal rotation term
    # pose convention matches sim.lateral_trajectory: Tcw @ [Ow,1] = 0
    back = T[:3, :3] @ np.asarray(rig.pos) + T[:3, 3]
    np.testing.assert_allclose(back, 0, atol=1e-6)


def test_ansi_preview_shapes():
    img = np.linspace(0, 255, 64 * 96).reshape(64, 96).astype(np.float32)
    s = _ansi_preview(img, cols=48)
    lines = s.split("\n")
    # 64 rows sampled at 2*step=4 -> 16 samples -> 8 top/bottom pairs
    assert len(lines) == 8
    assert "▀" in lines[0] and "\x1b[38;5;" in lines[0]


def test_scripted_session_tracks_and_saves(tmp_path):
    reset_frame_ids()
    reset_map_ids()
    world = PlaneWorld(width=320, height=240, f=250.0, second_plane=(3.0, 0.3))
    matcher = OrbFeatureMatcher(threshold=0.7, max_features=1000)
    params = SlamParameters(
        fx=world.f, fy=world.f, cx=world.cx, cy=world.cy,
        max_features=1000, minIniMatchCount=100,
        initializerModelFallback=True, prewarmShapes=False,
    )
    system = System(params, matcher, KeyFrameMatchDatabase(matcher), verbose=False)
    out = str(tmp_path / "traj.txt")
    png = str(tmp_path / "match.png")
    keys = ["i"] + ["right"] * 3 + [None] * 25 + ["t"]
    summary = run_interactive(
        system, world, keys=keys, png=png, png_every=10, out=out, verbose=False
    )
    assert summary["frames"] == len(keys)
    assert summary["dropped"] == 0  # scripted sessions are synchronous
    assert summary["state"] == "OK", summary
    assert summary["keyframes"] >= 2
    assert summary["trajectory_saves"] == 1
    assert os.path.exists(out) and os.path.getsize(out) > 0
    assert os.path.exists(png)


def test_scripted_quit_without_tty():
    """Exhausting the key stream quits cleanly even when nothing happened."""
    world = PlaneWorld(width=320, height=240, f=250.0)
    matcher = OrbFeatureMatcher(threshold=0.7, max_features=500)
    params = SlamParameters(
        fx=world.f, fy=world.f, cx=world.cx, cy=world.cy,
        max_features=500, prewarmShapes=False,
    )
    reset_frame_ids()
    reset_map_ids()
    system = System(params, matcher, KeyFrameMatchDatabase(matcher), verbose=False)
    summary = run_interactive(
        system, world, keys=[None], png=None, verbose=False
    )
    assert summary["frames"] == 1
    assert summary["keyframes"] == 0


def test_interactive_requires_tty_without_keys(monkeypatch):
    import sys

    monkeypatch.setattr(sys.stdin, "isatty", lambda: False)
    with pytest.raises(SystemExit):
        run_interactive(object(), object())
