"""Per-substage timing of keyframe events on the session backend.

Wraps LocalMapping's five stages, the loop scan, and the tracking-side
KF creation with wall timers over a prefix of the quality rect-loop
scenario, printing per-call ms so the dominant KF-event cost is visible
(VERDICT r3 #2 / r4 #4: kf_event_p95_ms < 1500 target).

Usage: python tools/tpu_kfevent_probe.py [n_poses] [--features=N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mono_slam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from mono_slam_framework_tpu.matchers import OrbFeatureMatcher
    from mono_slam_framework_tpu.params import SlamParameters
    from mono_slam_framework_tpu.sim import (
        RECT_LOOP_PLANES,
        PlaneWorld,
        rect_loop_trajectory,
    )
    from mono_slam_framework_tpu.slam import KeyFrameMatchDatabase, System
    from mono_slam_framework_tpu.slam.frame import reset_frame_ids
    from mono_slam_framework_tpu.slam.map_model import reset_map_ids
    from mono_slam_framework_tpu.slam.tracking import TrackingState

    n_poses = 45
    maxf = 2000
    for a in sys.argv[1:]:
        if a.startswith("--features="):
            maxf = int(a.split("=")[1])
        elif a.isdigit():
            n_poses = int(a)

    print("backend:", jax.default_backend(), "features:", maxf, flush=True)
    world = PlaneWorld(
        plane_z=2.0, second_plane=RECT_LOOP_PLANES, texture="smooth"
    )
    poses = rect_loop_trajectory(3.0, 2.2, 0.09)[:n_poses]

    reset_frame_ids()
    reset_map_ids()
    params = SlamParameters(
        fx=world.f, fy=world.f, cx=world.cx, cy=world.cy,
        max_features=maxf, minIniMatchCount=70,
        initializerModelFallback=True, prewarmShapes=True,
    )
    matcher = OrbFeatureMatcher(threshold=0.7, max_features=maxf)
    kf_db = KeyFrameMatchDatabase(matcher)
    system = System(params, matcher, kf_db, verbose=False)
    system.toggle_initialization_allowed()
    system.set_minimum_keyframes(0)

    stats: dict = {}

    def wrap(obj, name, tag):
        orig = getattr(obj, name)

        def timed(*a, **k):
            t0 = time.perf_counter()
            out = orig(*a, **k)
            stats.setdefault(tag, []).append(
                (time.perf_counter() - t0) * 1000.0
            )
            return out

        setattr(obj, name, timed)

    lm = system.local_mapper
    for nm in (
        "process_new_keyframe",
        "map_point_culling",
        "create_new_map_points",
        "search_in_neighbors",
        "keyframe_culling",
    ):
        wrap(lm, nm, f"lm.{nm}")
    from mono_slam_framework_tpu.slam import local_mapping as lm_mod

    wrap(lm_mod, "run_local_ba", "lm.run_local_ba")
    wrap(kf_db, "detect_loop_candidate", "db.loop_scan")
    wrap(system.tracker, "create_new_keyframe", "trk.create_kf")
    wrap(matcher, "match_against_many", "matcher.many")
    # hot host-model methods (counted, cheap wrapper)
    from mono_slam_framework_tpu.slam.map_model import KeyFrame, MapPoint

    wrap(MapPoint, "update_normal_and_depth", "mp.upd_normal")
    wrap(MapPoint, "replace", "mp.replace")
    wrap(KeyFrame, "update_connections", "kf.upd_conn")

    imgs = [world.render(T) for T in poses]
    t = 0.0
    t0 = time.perf_counter()
    for i, T in enumerate(poses):
        f0 = time.perf_counter()
        system.track_monocular(imgs[i], t)
        t += 0.1
        if system.tracker.state == TrackingState.NO_IMAGES_YET:
            system.toggle_initialization_allowed()
    wall = time.perf_counter() - t0
    print("wall_s:", round(wall, 1), "n_kf:", system.map.n_keyframes())
    for tag, xs in sorted(stats.items()):
        xs_s = sorted(xs)
        print(
            f"{tag:28s} n={len(xs):3d} total_s={sum(xs)/1000:7.1f} "
            f"p50={xs_s[len(xs)//2]:8.1f} max={xs_s[-1]:8.1f}"
        )


if __name__ == "__main__":
    main()
