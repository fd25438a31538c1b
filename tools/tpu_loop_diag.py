"""TPU diagnostic: why does the hard-world loop fire (or not)?

Replicates quality_bench.run_quality's scenario on the session backend with
a diagnostic KF database that records every loop scan's per-candidate
scores (match count, both-side-MP count, connectivity exclusion), plus the
per-frame tracking-state / keyframe timeline. Prints a compact report.

Usage: python tools/tpu_loop_diag.py [n_poses] [--dropout]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    if "--f32mm" in sys.argv:
        # A/B: TPU matmuls default to bf16 passes; geometry/optimizer math
        # through `@`/einsum silently loses mantissa vs the CPU backend
        jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mono_slam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
    from mono_slam_framework_tpu.slam.tracking import TrackingState

    n_poses = None
    dropout = "--dropout" in sys.argv
    maxf = 600
    step = 0.09
    for a in sys.argv[1:]:
        if a.startswith("--features="):
            maxf = int(a.split("=")[1])
        elif a.startswith("--step="):
            step = float(a.split("=")[1])
        elif a.isdigit():
            n_poses = int(a)

    print("backend:", jax.default_backend(), flush=True)
    world = PlaneWorld(
        plane_z=2.0, second_plane=RECT_LOOP_PLANES, texture="smooth"
    )
    poses = rect_loop_trajectory(3.0, 2.2, step)
    print("step:", step, "poses:", len(poses), flush=True)
    if n_poses:
        poses = poses[:n_poses]

    reset_frame_ids()
    reset_map_ids()
    print("max_features:", maxf, flush=True)
    params = SlamParameters(
        fx=world.f, fy=world.f, cx=world.cx, cy=world.cy,
        max_features=maxf, minIniMatchCount=70,
        initializerModelFallback=True, prewarmShapes="--cpu" not in sys.argv,
    )
    matcher = OrbFeatureMatcher(threshold=0.7, max_features=maxf)

    class DiagDB(KeyFrameMatchDatabase):
        def __init__(self, m):
            super().__init__(m)
            self.scan_log = []

        def detect_loop_candidate(self, kf, min_num_mp_matches: int):
            if not self.frames:
                return None
            connected = kf.get_connected_keyframes()
            results = self.matcher.match_against_many(kf, self.frames)
            scores = []
            best, best_num = None, 0
            for kfi, res in zip(self.frames, results):
                num_mp = 0
                for i in range(res.num_matches):
                    if (
                        res.get_map_point1(i) is not None
                        and res.get_map_point2(i) is not None
                    ):
                        num_mp += 1
                scores.append(
                    (kfi.id, res.num_matches, num_mp, kfi in connected)
                )
                if kfi in connected or res.num_matches == 0:
                    continue
                if num_mp > min_num_mp_matches and num_mp > best_num:
                    best, best_num = kfi, num_mp
            self.scan_log.append(
                {"query_kf": kf.id, "scores": scores, "picked": best.id if best else None}
            )
            return best

    kf_db = DiagDB(matcher)
    verbose = "--verbose" in sys.argv
    system = System(params, matcher, kf_db, verbose=verbose)
    system.toggle_initialization_allowed()
    system.set_minimum_keyframes(0)
    system.loop_closer.verbose = True  # always show prealign/fuse lines

    gt_t, gt_p = [], []
    timeline = []
    kf_by_frame = {}
    frame_rows = []  # (i, wall_ms, state, inliers, n_kf, n_mp)
    track_centers: list = []  # per-frame camera center at track time
    track_refs: list = []

    # spy the loop correction: ATE immediately before/after (quality_bench's
    # measurement), plus the correction's frame index
    import tempfile

    from mono_slam_framework_tpu.io import trajectory as _traj

    def ate_now():
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "fr.txt")
            system.save_trajectory_tum(p)
            t_fr, p_fr, _ = _traj.read_tum(p)
        if len(t_fr) < 3:
            return None
        a, n = _traj.ate_rmse(t_fr, p_fr, np.array(gt_t), np.stack(gt_p))
        return float(a) if n >= 10 else None

    loop_events = []
    _orig_correct = system.loop_closer.correct_loop
    _orig_fuse = system.loop_closer.fuse_loop_duplicates
    _orig_gba = system.loop_closer.run_global_bundle_adjustment

    def spy_fuse():
        _orig_fuse()
        print(f"ATE after prealign+fuse: {ate_now()}", flush=True)

    def spy_gba(kf_id):
        _orig_gba(kf_id)
        print(f"ATE after loop GBA: {ate_now()}", flush=True)

    system.loop_closer.fuse_loop_duplicates = spy_fuse
    system.loop_closer.run_global_bundle_adjustment = spy_gba

    def spy_correct():
        b = ate_now()
        _orig_correct()
        loop_events.append((b, ate_now()))
        print(f"LOOP EVENT: before={b} after={loop_events[-1][1]}", flush=True)

    system.loop_closer.correct_loop = spy_correct
    t0 = time.perf_counter()
    t = 0.0
    imgs_pre = [world.render(T) for T in poses]  # render outside timing
    on_cpu = "--cpu" in sys.argv
    for i, T in enumerate(poses):
        if on_cpu and i % 10 == 0:
            # XLA-CPU mmap guard (KNOWN_ISSUES.md round-3)
            try:
                if sum(1 for _ in open("/proc/self/maps")) > 45_000:
                    jax.clear_caches()
            except OSError:
                pass
        f0 = time.perf_counter()
        system.track_monocular(imgs_pre[i], t)
        fms = (time.perf_counter() - f0) * 1000.0
        gt_t.append(t)
        gt_p.append(-(T[:3, :3].T @ T[:3, 3]))
        t += 0.1
        st = system.tracker.state
        timeline.append(st.name[:2])
        kf_by_frame[i] = system.map.n_keyframes()
        # tracked pose at TRACK TIME (vs the re-anchored export): separates
        # tracking-branch flips from trajectory re-anchoring artifacts
        cf = system.tracker.current_frame
        track_centers.append(
            cf.get_camera_center().copy()
            if cf is not None and cf.Tcw is not None
            else np.full(3, np.nan, np.float32)
        )
        ref = getattr(cf, "reference_kf", None) if cf is not None else None
        track_refs.append(ref.id if ref is not None else -1)
        m = system.last_metrics or {}
        frame_rows.append(
            (i, fms, st.name[:2], m.get("inliers"), m.get("n_kf"),
             m.get("n_mp"))
        )
        if st == TrackingState.NO_IMAGES_YET:
            system.toggle_initialization_allowed()
        if dropout and i == 10:
            for _ in range(2):
                system.track_monocular(
                    np.full((world.h, world.w), 128.0, np.float32), t
                )
                t += 0.1
    wall = time.perf_counter() - t0

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "fr.txt")
        system.save_trajectory_tum(p)
        t_fr, p_fr, _ = trajectory.read_tum(p)
    ate = None
    if len(t_fr) >= 3:
        a, n = trajectory.ate_rmse(t_fr, p_fr, np.array(gt_t), np.stack(gt_p))
        ate = float(a)

    print("wall_s:", round(wall, 1), "ate:", ate, flush=True)
    # dump estimated vs gt trajectory + KF chain for offline drift analysis
    try:
        with tempfile.TemporaryDirectory() as td:
            p2 = os.path.join(td, "fr.txt")
            system.save_trajectory_tum(p2)
            t_fr, p_fr, _ = trajectory.read_tum(p2)
        kfs = sorted(
            (kf for kf in system.map.all_keyframes() if not kf.is_bad),
            key=lambda k: k.id,
        )
        np.savez(
            "/tmp/loop_diag_traj.npz",
            t_est=t_fr, p_est=p_fr,
            t_gt=np.array(gt_t), p_gt=np.stack(gt_p),
            kf_ids=np.array([k.id for k in kfs]),
            kf_pos=np.stack([k.get_camera_center() for k in kfs]),
            track_centers=np.stack(track_centers),
            track_refs=np.array(track_refs),
        )
        print("traj dumped to /tmp/loop_diag_traj.npz", flush=True)
    except Exception as e:
        print("traj dump failed:", e)
    print("timeline:", "".join(timeline))
    print("n_keyframes:", system.map.n_keyframes(), "n_scans:", len(kf_db.scan_log))
    print(
        "loop_detected:", system.loop_closer.last_loop_kf_id > 0,
        "fused:", system.loop_closer.last_fuse_count,
    )
    # end-of-run loop-connectivity: do the final (revisit) keyframes share
    # covisibility with the start keyframes? If yes, tracking latched onto
    # the old map and DetectLoop CORRECTLY never fires (QUIRKS round-3).
    kfs_sorted = sorted(
        (kf for kf in system.map.all_keyframes() if not kf.is_bad),
        key=lambda k: k.id,
    )
    early_ids = {k.id for k in kfs_sorted[:8]}
    for kf in kfs_sorted[-5:]:
        conn = sorted(
            c.id for c in kf.get_connected_keyframes() if c.id in early_ids
        )
        print(f"kf{kf.id} early-connections: {conn}")
    # KF creation cadence: frame index -> #KFs steps
    steps = []
    prev = 0
    for i in sorted(kf_by_frame):
        if kf_by_frame[i] != prev:
            steps.append((i, kf_by_frame[i]))
            prev = kf_by_frame[i]
    print("kf_steps:", steps)
    # stage totals from the system profiler, if enabled
    if getattr(system, "timer", None) is not None:
        tot = {k: round(v, 1) for k, v in system.timer.totals.items()}
        print("stage_totals_s:", tot)
    # wall-time concentration: top-12 slowest frames + sum of the rest
    rows = sorted(frame_rows, key=lambda r: -r[1])
    top = rows[:12]
    rest = sum(r[1] for r in rows[12:]) / 1000.0
    print("slowest_frames (i, ms, st, inl):",
          [(r[0], round(r[1]), r[2], r[3]) for r in top])
    print("rest_wall_s:", round(rest, 1))
    # inlier trace every 4 frames
    print("inlier_trace:",
          [(r[0], r[2], r[3]) for r in frame_rows[::4]])
    # last scans: best num_mp among unconnected
    for scan in kf_db.scan_log[-12:]:
        unconn = [x for x in scan["scores"] if not x[3]]
        top = sorted(unconn, key=lambda x: -x[2])[:3]
        print(
            f"scan q={scan['query_kf']} picked={scan['picked']} "
            f"top_unconnected(kf,nm,nmp)={[(a, b, c) for a, b, c, _ in top]}"
        )


if __name__ == "__main__":
    main()
