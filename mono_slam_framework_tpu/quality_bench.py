"""Tracking-quality bench: ATE + loop-closure quality on the hard world.

Run as `python -m mono_slam_framework_tpu.quality_bench`; prints ONE JSON
line. bench.py invokes it as a SUBPROCESS pinned to the CPU backend so the
quality numbers ride next to the TPU perf numbers in the driver's JSON
without costing TPU time (VERDICT r3 #5/#6: quality must be tracked
round-over-round by the same driver that tracks FPS).

The scenario is the off-lattice "hard world" of tests/test_hard_world.py
minus the sensor-dropout leg: a rectangular lawnmower loop whose return
strip shares no view with the outbound strip (a genuine loop — image match
without covisibility, LoopClosing.cc:69-99), smooth texture so corners sit
off the 8 px lattice. Reported:

  * ate_rmse_hardworld  — final full-trajectory scale-aligned ATE RMSE
    (io/trajectory.ate_rmse vs ground truth; north star = BASELINE.md
    trajectory-fidelity row)
  * ate_loop_before/after — ATE immediately before/after the loop
    CorrectLoop fires (the loop global BA's measured drift removal,
    LoopClosing.cc:101-115)
"""

from __future__ import annotations

import json
import os
import tempfile


def run_quality(n_poses: int | None = None, fuse_duplicates: bool | None = None):
    import jax

    # the axon sitecustomize pre-imports jax on the TPU; this subprocess is
    # CPU-only by design (quality is backend-independent host math)
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import numpy as np

    from mono_slam_framework_tpu.io import trajectory
    from mono_slam_framework_tpu.matchers import OrbFeatureMatcher
    from mono_slam_framework_tpu.params import SlamParameters
    from mono_slam_framework_tpu.sim import PlaneWorld, rect_loop_trajectory
    from mono_slam_framework_tpu.slam import KeyFrameMatchDatabase, System
    from mono_slam_framework_tpu.slam.frame import reset_frame_ids
    from mono_slam_framework_tpu.slam.map_model import reset_map_ids

    world = PlaneWorld(
        plane_z=2.0, second_plane=[(2.3, -0.9), (1.7, 0.3)], texture="smooth"
    )
    poses = rect_loop_trajectory(3.0, 2.2, 0.09)
    if n_poses is not None:
        poses = poses[:n_poses]

    reset_frame_ids()
    reset_map_ids()
    params = SlamParameters(
        fx=world.f, fy=world.f, cx=world.cx, cy=world.cy,
        max_features=600, minIniMatchCount=70,
        initializerModelFallback=True,
        # long single-process CPU run: speculative prewarm compiles cost
        # XLA-CPU mmap budget (KNOWN_ISSUES.md mmap accumulation)
        prewarmShapes=False,
        # SlamParameters is a frozen dataclass: the override must ride the
        # constructor (None = the params.py default)
        **(
            {}
            if fuse_duplicates is None
            else {"loopFuseDuplicates": fuse_duplicates}
        ),
    )
    matcher = OrbFeatureMatcher(threshold=0.7, max_features=600)
    system = System(params, matcher, KeyFrameMatchDatabase(matcher), verbose=False)
    system.toggle_initialization_allowed()
    system.set_minimum_keyframes(0)

    gt_t, gt_p = [], []

    def ate_now():
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "fr.txt")
            system.save_trajectory_tum(p)
            t_fr, p_fr, _ = trajectory.read_tum(p)
        if len(t_fr) < 3:
            return None
        a, n = trajectory.ate_rmse(t_fr, p_fr, np.array(gt_t), np.stack(gt_p))
        return float(a) if n >= 10 else None

    # spy the loop correction to measure ATE immediately before/after
    orig_correct = system.loop_closer.correct_loop
    loop_events: list = []

    def spy_correct():
        before = ate_now()
        orig_correct()
        loop_events.append((before, ate_now()))

    system.loop_closer.correct_loop = spy_correct

    def _maybe_reclaim_compile_maps():
        # XLA-CPU compiles leak mmaps until vm.max_map_count kills further
        # compiles; clear the executable caches near the limit
        # (KNOWN_ISSUES.md round-3 mmap section)
        try:
            n = sum(1 for _ in open("/proc/self/maps"))
        except OSError:
            return
        if n > 45_000:
            jax.clear_caches()

    from mono_slam_framework_tpu.slam.tracking import TrackingState

    t = 0.0
    n_ok = 0
    for i, T in enumerate(poses):
        if i % 10 == 0:
            _maybe_reclaim_compile_maps()
        system.track_monocular(world.render(T), t)
        gt_t.append(t)
        gt_p.append(-(T[:3, :3].T @ T[:3, 3]))
        t += 0.1
        if system.tracker.state == TrackingState.NO_IMAGES_YET:
            system.toggle_initialization_allowed()
        if system.tracker.state == TrackingState.OK:
            n_ok += 1

    before = after = None
    if loop_events:
        before, after = loop_events[-1]
    rnd = lambda x: None if x is None else round(x, 4)
    return {
        "ate_rmse_hardworld": rnd(ate_now()),
        "ate_loop_before": rnd(before),
        "ate_loop_after": rnd(after),
        "loop_detected": bool(system.loop_closer.last_loop_kf_id > 0),
        "quality_frames_ok_share": round(n_ok / max(len(poses), 1), 3),
    }


def main() -> None:
    print(json.dumps(run_quality()))


if __name__ == "__main__":
    main()
