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

# Rect-loop trajectory step (world units/frame; optical flow ~250*step px
# at the z~2 planes). Round-5 A/B on the real chip (tools/tpu_loop_diag.py
# --step=...): 0.09 (~22 px/frame) starves mapping on the never-mapped
# return strip (LOST on leg 3, reloc steals the loop); 0.06 tracks clean
# but the final descent latches onto the old map covisibly and DetectLoop
# CORRECTLY never fires; 0.075 keeps tracking alive AND yields the genuine
# loop (fired with 25 fused pairs, correction measured 1.44 -> 1.11).
QUALITY_STEP = float(os.environ.get("QUALITY_STEP", "0.075"))


def run_quality(
    n_poses: int | None = None,
    fuse_duplicates: bool | None = None,
    force_cpu: bool = True,
    dropout_at: int | None = None,
    both_arms: bool = False,
):
    import jax

    if force_cpu:
        # standalone mode: the axon sitecustomize pre-imports jax on the
        # TPU; pin this process to CPU (quality is backend-independent host
        # math). bench.py instead runs the arms IN-PROCESS on the TPU
        # (force_cpu=False): ~50 ms/frame through the relay vs ~7 s/frame
        # on this one-core box's XLA-CPU — the only way the quality arms
        # fit the driver's 30-minute bench budget (VERDICT r4 #1).
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import numpy as np

    from mono_slam_framework_tpu.io import trajectory
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

    world = PlaneWorld(
        plane_z=2.0, second_plane=RECT_LOOP_PLANES, texture="smooth"
    )
    poses = rect_loop_trajectory(3.0, 2.2, QUALITY_STEP)
    if n_poses is not None:
        poses = poses[:n_poses]

    # 2000 features — the north-star operating point. Measured on the real
    # chip (tools/tpu_loop_diag.py A/B): at 600 features the smooth-texture
    # map is too thin at the third corner (inliers 72 -> 2, LOST, reloc
    # snaps onto the old map and the genuine loop never fires), while at
    # 2000 the corner survives and the loop fires with ~20 both-side-MP
    # matches. It also shares every extract/match executable with the perf
    # regimes when bench.py runs these arms in-process on the TPU (the
    # 600-feature bucket family alone cost ~190 s of relay loads).
    maxf = 600 if force_cpu else 2000
    reset_frame_ids()
    reset_map_ids()
    params = SlamParameters(
        fx=world.f, fy=world.f, cx=world.cx, cy=world.cy,
        max_features=maxf, minIniMatchCount=70,
        initializerModelFallback=True,
        # CPU: speculative prewarm compiles cost XLA-CPU mmap budget
        # (KNOWN_ISSUES.md mmap accumulation). TPU: prewarm hides the
        # ~1.5 s per-bucket executable loads behind the frame loop.
        prewarmShapes=not force_cpu,
        # SlamParameters is a frozen dataclass: the override must ride the
        # constructor (None = the params.py default)
        **(
            {}
            if fuse_duplicates is None
            else {"loopFuseDuplicates": fuse_duplicates}
        ),
    )
    matcher = OrbFeatureMatcher(threshold=0.7, max_features=maxf)
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
    fork_events: list = []
    frame_counter = [0]

    def run_fork_twin() -> float | None:
        """Measure the reference fork's GBA-only CorrectLoop
        (LoopClosing.cc:101-115, loopFuseDuplicates=False twin) on the SAME
        map state the default arm is about to correct, then restore the
        geometry. Both arms share one trajectory: everything up to the loop
        event is identical by construction, so re-driving a second full
        115-pose run for the fork twin (~700 s through the relay,
        VERDICT r4 #1's budget burner) measures nothing extra."""
        lc = system.loop_closer
        snap_kf = [
            (kf, kf.get_pose().copy())
            for kf in system.map.all_keyframes()
            if not kf.is_bad
        ]
        snap_mp = [
            (mp, mp.world_pos.copy())
            for mp in system.map.all_map_points()
            if not mp.is_bad
        ]
        saved_fuse, saved_lm = lc.fuse_duplicates, lc.local_mapper
        lc.fuse_duplicates = False  # fork GBA schedule (10 iters)
        lc.local_mapper = None  # release() would drop queued KFs
        try:
            lc.current_kf.update_connections()
            lc.run_global_bundle_adjustment(lc.current_kf.id)
            after = ate_now()
        finally:
            lc.fuse_duplicates, lc.local_mapper = saved_fuse, saved_lm
            for kf, T in snap_kf:
                kf.set_pose(T)
            for mp, X in snap_mp:
                mp.set_world_pos(X)
        return after

    def spy_correct():
        before = ate_now()
        if both_arms and system.loop_closer.fuse_duplicates:
            try:
                fork_events.append((before, run_fork_twin()))
            except Exception:
                fork_events.append((before, None))
        orig_correct()
        loop_events.append(
            (
                before,
                ate_now(),
                frame_counter[0],
                system.loop_closer.last_fuse_count,
            )
        )

    system.loop_closer.correct_loop = spy_correct

    def _maybe_reclaim_compile_maps():
        # XLA-CPU compiles leak mmaps until vm.max_map_count kills further
        # compiles; clear the executable caches near the limit
        # (KNOWN_ISSUES.md round-3 mmap section). NEVER on TPU: clearing
        # would wipe the bench process's dispatch caches for every
        # subsequent regime.
        if not force_cpu:
            return
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
        frame_counter[0] = i
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
        if dropout_at is not None and i == dropout_at:
            # sensor-dropout leg (tests/test_hard_world.py): two flat frames
            # force LOST -> relocalization
            for _ in range(2):
                system.track_monocular(
                    np.full((world.h, world.w), 128.0, np.float32), t
                )
                t += 0.1

    before = after = frame_idx = fused = None
    if loop_events:
        before, after, frame_idx, fused = loop_events[-1]
    rnd = lambda x: None if x is None else round(x, 4)
    out = {
        "ate_rmse_hardworld": rnd(ate_now()),
        "ate_loop_before": rnd(before),
        "ate_loop_after": rnd(after),
        "loop_detected": bool(system.loop_closer.last_loop_kf_id > 0),
        "loop_frame_idx": frame_idx,
        "loop_fused": fused,
        "quality_frames_ok_share": round(n_ok / max(len(poses), 1), 3),
    }
    if both_arms and fork_events:
        fb, fa = fork_events[-1]
        out["ate_loop_before_fork"] = rnd(fb)
        out["ate_loop_after_fork"] = rnd(fa)
    return out


def run_quality_loftr(n_poses: int | None = None, force_cpu: bool = True):
    """LoFTR matcher quality row (VERDICT r4 #7): the framework exists to
    compare feature matchers (README.md:1-2, FeatureMatcher.h:41-47), so the
    driver must track BOTH plugins' tracking quality. Same hard world and
    rect-loop trajectory as the ORB arms, DNN matcher at the reference app's
    configuration (threshold 0.1, src/main.cpp:63). Default pose budget is
    smaller than ORB's: the transformer forward dominates, and the row's
    purpose is an ATE-quality comparison, not loop coverage."""
    import jax

    if force_cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import numpy as np

    from mono_slam_framework_tpu.io import trajectory
    from mono_slam_framework_tpu.matchers.loftr_matcher import LoftrFeatureMatcher
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

    world = PlaneWorld(
        plane_z=2.0, second_plane=RECT_LOOP_PLANES, texture="smooth"
    )
    poses = rect_loop_trajectory(3.0, 2.2, QUALITY_STEP)
    if n_poses is None:
        n_poses = int(os.environ.get("QUALITY_LOFTR_POSES", "40"))
    poses = poses[:n_poses]

    reset_frame_ids()
    reset_map_ids()
    params = SlamParameters(
        fx=world.f, fy=world.f, cx=world.cx, cy=world.cy,
        minIniMatchCount=40, initializerModelFallback=True,
        prewarmShapes=not force_cpu,
    )
    matcher = LoftrFeatureMatcher(threshold=0.1, fine=False)
    system = System(params, matcher, KeyFrameMatchDatabase(matcher), verbose=False)
    system.toggle_initialization_allowed()
    system.set_minimum_keyframes(0)

    gt_t, gt_p = [], []
    t = 0.0
    n_ok = 0
    for i, T in enumerate(poses):
        system.track_monocular(world.render(T), t)
        gt_t.append(t)
        gt_p.append(-(T[:3, :3].T @ T[:3, 3]))
        t += 0.1
        if system.tracker.state == TrackingState.NO_IMAGES_YET:
            system.toggle_initialization_allowed()
        if system.tracker.state == TrackingState.OK:
            n_ok += 1

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "fr.txt")
        system.save_trajectory_tum(p)
        t_fr, p_fr, _ = trajectory.read_tum(p)
    ate = None
    if len(t_fr) >= 3:
        a, n = trajectory.ate_rmse(t_fr, p_fr, np.array(gt_t), np.stack(gt_p))
        ate = float(a) if n >= 10 else None
    return {
        "ate_rmse_hardworld_loftr": None if ate is None else round(ate, 4),
        "quality_loftr_frames_ok_share": round(n_ok / max(len(poses), 1), 3),
        "quality_loftr_poses": len(poses),
    }


def main() -> None:
    """Emit a CUMULATIVE JSON line after each quality arm so a deadline kill
    preserves every completed arm (VERDICT r4 #1/#5: the silent-`{}`-on-
    timeout join burned round 4's quality evidence). Arms, in priority
    order:
      1. shipped defaults (loopFuseDuplicates=True) with the reference-fork
         twin measured off the SAME trajectory at the loop event
         (both_arms): ate_rmse_hardworld + ate_loop_before/after (the
         default's drift removal, VERDICT r4 #2) next to ate_loop_*_fork
         (the measured no-op being beaten, QUIRKS.md "loop fuse default");
      2. LoFTR matcher row: ate_rmse_hardworld_loftr (VERDICT r4 #7).
    A wall-clock deadline (QUALITY_DEADLINE_S, default 1200 s) is checked
    between arms; arms that would start past it are skipped."""
    import time

    t0 = time.monotonic()
    deadline = float(os.environ.get("QUALITY_DEADLINE_S", "1200"))
    n_poses = os.environ.get("QUALITY_POSES")
    n_poses = int(n_poses) if n_poses else None

    out: dict = {}

    def emit():
        print(json.dumps(out), flush=True)

    arms = [
        (None, lambda: run_quality(n_poses=n_poses, both_arms=True)),
        ("_loftr", run_quality_loftr),
    ]
    for suffix, fn in arms:
        if time.monotonic() - t0 > deadline:
            out.setdefault("quality_skipped_arms", []).append(suffix or "default")
            continue
        try:
            fields = fn()
        except Exception as e:
            out[f"quality_error{suffix or ''}"] = repr(e)[:200]
            emit()
            continue
        out.update(fields)
        emit()
    if "quality_skipped_arms" in out:
        emit()


if __name__ == "__main__":
    main()
