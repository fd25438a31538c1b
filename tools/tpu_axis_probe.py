"""Axis-asymmetry probe: straight-line tracking ATE along +x vs +y vs diag.

The rect-loop quality scenario breaks on its +y leg while every other test
trajectory translates along +x — if straight +y tracking drifts where +x
does not, some pipeline stage treats the axes differently (detection
banding, subpixel, triangulation, KF gating).

Usage: python tools/tpu_axis_probe.py [--cpu] [--f32mm] [--features=N] [n_frames]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_axis(
    axis, n_frames, maxf, world_kw, step=0.09, corner_at=None,
    params_extra=None, disable_ba=False,
):
    import numpy as np

    from mono_slam_framework_tpu.io import trajectory
    from mono_slam_framework_tpu.matchers import OrbFeatureMatcher
    from mono_slam_framework_tpu.params import SlamParameters
    from mono_slam_framework_tpu.sim import PlaneWorld
    from mono_slam_framework_tpu.slam import KeyFrameMatchDatabase, System
    from mono_slam_framework_tpu.slam.frame import reset_frame_ids
    from mono_slam_framework_tpu.slam.map_model import reset_map_ids
    from mono_slam_framework_tpu.slam.tracking import TrackingState

    world = PlaneWorld(**world_kw)
    poses = []
    c = np.zeros(3, np.float32)
    d = np.array(axis, np.float32)
    for i in range(n_frames):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = -c
        poses.append(T)
        if corner_at is not None and i == corner_at:
            d = np.array([0, 1, 0], np.float32)  # turn the rect-loop corner
        c = c + d * step

    reset_frame_ids()
    reset_map_ids()
    params = SlamParameters(
        fx=world.f, fy=world.f, cx=world.cx, cy=world.cy,
        max_features=maxf, minIniMatchCount=70,
        initializerModelFallback=True, prewarmShapes=False,
        **(params_extra or {}),
    )
    from mono_slam_framework_tpu.slam import local_mapping as _lm_mod

    _orig_ba = _lm_mod.run_local_ba
    if disable_ba:
        _lm_mod.run_local_ba = lambda *a, **k: None
    matcher = OrbFeatureMatcher(threshold=0.7, max_features=maxf)
    system = System(params, matcher, KeyFrameMatchDatabase(matcher), verbose=False)
    system.toggle_initialization_allowed()
    system.set_minimum_keyframes(0)

    gt_t, gt_p, centers, states, inliers = [], [], [], [], []
    t = 0.0
    for i, T in enumerate(poses):
        system.track_monocular(world.render(T), t)
        gt_t.append(t)
        gt_p.append(-(T[:3, :3].T @ T[:3, 3]))
        t += 0.1
        if system.tracker.state == TrackingState.NO_IMAGES_YET:
            system.toggle_initialization_allowed()
        cf = system.tracker.current_frame
        centers.append(
            cf.get_camera_center().copy()
            if cf is not None and cf.Tcw is not None
            else np.full(3, np.nan, np.float32)
        )
        states.append(system.tracker.state.name[:2])
        m = system.last_metrics or {}
        inliers.append((m.get("inliers"), m.get("n_mp")))

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "fr.txt")
        system.save_trajectory_tum(p)
        t_fr, p_fr, _ = trajectory.read_tum(p)
    ate = None
    if len(t_fr) >= 3:
        a, n = trajectory.ate_rmse(t_fr, p_fr, np.array(gt_t), np.stack(gt_p))
        ate = round(float(a), 4)
    _lm_mod.run_local_ba = _orig_ba
    return ate, centers, states, inliers, system.map.n_keyframes()


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    if "--f32mm" in sys.argv:
        jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mono_slam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    maxf = 2000
    n_frames = 25
    for a in sys.argv[1:]:
        if a.startswith("--features="):
            maxf = int(a.split("=")[1])
        elif a.isdigit():
            n_frames = int(a)

    from mono_slam_framework_tpu.sim import RECT_LOOP_PLANES

    world_kw = dict(
        plane_z=2.0,
        second_plane=(
            [(2.3, -0.9), (1.7, 0.3)]
            if "--flatworld" in sys.argv
            else RECT_LOOP_PLANES
        ),
        texture="smooth",
    )
    print("backend:", jax.default_backend(), "features:", maxf, flush=True)
    arms = [
        ("corner", dict(corner_at=15)),
        ("corner-noba", dict(corner_at=15, disable_ba=True)),
        ("corner-twoprog", dict(corner_at=15, params_extra={"fusedOneStep": False})),
        ("corner-unfused", dict(corner_at=15, params_extra={"fusedTracking": False})),
    ]
    if "--gate" in sys.argv:
        # upstream ORB-SLAM2's REAL triangulation parallax gate
        # (cosParallaxRays < 0.9998) vs the fork's no-op 1.1
        arms = [
            ("corner-gate", dict(corner_at=15, params_extra={"minimumParallax": 0.9998})),
            ("+x-gate", dict(params_extra={"minimumParallax": 0.9998})),
            ("diag-gate", dict(params_extra={"minimumParallax": 0.9998})),
        ]
    if "--straight" in sys.argv:
        arms = [("+x", {}), ("diag", dict(corner_at=None))]
    for name, kw in arms:
        axis = (0.7071, 0.7071, 0) if name.startswith("diag") else (1, 0, 0)
        t0 = time.perf_counter()
        ate, centers, states, inliers, n_kf = run_axis(
            axis, n_frames, maxf, world_kw, **kw
        )
        wall = time.perf_counter() - t0
        c = np.array(centers)
        print(
            f"axis {name}: ate={ate} n_kf={n_kf} wall={wall:.0f}s "
            f"states={''.join(states)}"
        )
        for i in range(1, len(c)):
            step = np.linalg.norm(c[i] - c[i - 1]) if i else 0.0
            print(
                f"   f{i}: {np.round(c[i], 3)} step={step:.3f} "
                f"inl={inliers[i][0]} n_mp={inliers[i][1]}"
            )


if __name__ == "__main__":
    main()
