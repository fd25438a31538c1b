"""Matcher A/B comparison harness.

The reference framework exists to compare feature matchers (README.md:1-2 of
the reference; SURVEY.md §0): the host app swaps FeatureMatcher
implementations and compares tracking behavior. This harness runs the same
sequence through each requested matcher and reports per-matcher tracking
statistics, timing, and (with ground truth) ATE — the BASELINE.json
configs[4] "batched ORB-vs-LoFTR sweep" in single-host form; the multi-chip
data-parallel form lives in parallel/sweep.py.

Usage:
  python -m mono_slam_framework_tpu.ab_sweep --dataset tum --path <seq> \
      --fx .. --fy .. --cx .. --cy .. [--matchers orb,loftr] [--ate]
"""

from __future__ import annotations

import argparse
import json
import time


def run_one(matcher_name: str, args) -> dict:
    from mono_slam_framework_tpu.io.datasets import GROUNDTRUTH_LOADERS, LOADERS
    from mono_slam_framework_tpu.params import SlamParameters
    from mono_slam_framework_tpu.run import build_matcher
    from mono_slam_framework_tpu.slam import KeyFrameMatchDatabase, System

    matcher = build_matcher(matcher_name, args)
    fused = bool(getattr(args, "fused", False) or getattr(args, "fused_one_step", False))
    params = SlamParameters(
        fx=args.fx, fy=args.fy, cx=args.cx, cy=args.cy,
        max_features=args.features,
        minIniMatchCount=args.min_ini_matches,
        initializerModelFallback=getattr(args, "model_fallback", False),
        fusedTracking=fused and matcher_name == "orb",
        fusedOneStep=bool(getattr(args, "fused_one_step", False))
        and matcher_name == "orb",
    )
    system = System(params, matcher, KeyFrameMatchDatabase(matcher), verbose=False)

    t0 = time.perf_counter()
    n = 0
    lost = 0
    for frame in LOADERS[args.dataset](args.path):
        if n == 0:
            system.toggle_initialization_allowed()
        system.track_monocular(frame.image, frame.timestamp)
        if system.last_metrics.get("state") == "LOST":
            lost += 1
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    wall = time.perf_counter() - t0

    out_path = f"{args.out_prefix}_{matcher_name}.txt"
    system.save_keyframe_trajectory_tum(out_path)
    result = {
        "matcher": matcher_name,
        "frames": n,
        "fps": round(n / wall, 2),
        "keyframes": system.map.n_keyframes(),
        "map_points": system.map.n_map_points(),
        "lost_frames": lost,
        "final_state": system.last_metrics.get("state"),
        "stage_timing": system.timer.summary(),
        "trajectory": out_path,
    }
    if args.ate:
        from mono_slam_framework_tpu.io import trajectory

        gt_t, gt_p, _ = GROUNDTRUTH_LOADERS[args.dataset](args.path)
        t_est, p_est, _ = trajectory.read_tum(out_path)
        ate, n_assoc = trajectory.ate_rmse(t_est, p_est, gt_t, gt_p)
        result["ate_rmse"] = round(ate, 4)
        result["ate_pairs"] = n_assoc
    return result


def run_sharded_loftr(args) -> dict:
    """Mesh-sharded LoFTR pairwise sweep over the sequence (BASELINE.json
    configs[4] multi-chip form): encode every frame once (cacheable backbone),
    then match all consecutive pairs data-parallel over the device mesh
    (parallel/sweep.py::sharded_loftr_sweep). Reports per-pair match counts
    and device throughput rather than full tracking (the tracking A/B is the
    per-matcher run_one path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mono_slam_framework_tpu.io.datasets import LOADERS
    from mono_slam_framework_tpu.matchers.loftr_matcher import MODEL_H, MODEL_W
    from mono_slam_framework_tpu.models import loftr_native
    from mono_slam_framework_tpu.parallel import make_mesh, sharded_loftr_sweep

    params = loftr_native.load_params(args.loftr_model)
    images = []
    for frame in LOADERS[args.dataset](args.path):
        images.append(np.asarray(frame.image, np.float32))
        if args.max_frames and len(images) >= args.max_frames:
            break

    t0 = time.perf_counter()
    feats = []
    for img in images:
        dev = jnp.asarray(img)
        if dev.shape != (MODEL_H, MODEL_W):
            dev = jax.image.resize(dev, (MODEL_H, MODEL_W), "bilinear")
        feats.append(loftr_native.encode(params, (dev / 255.0)[None, None])[0])
    mesh = make_mesh()
    n_pairs = len(feats) - 1
    ndev = mesh.devices.size
    cap = ((n_pairs + ndev - 1) // ndev) * ndev  # pad batch to mesh multiple
    f1 = jnp.stack([feats[min(i, n_pairs - 1)] for i in range(cap)])
    f2 = jnp.stack([feats[min(i + 1, n_pairs)] for i in range(cap)])
    vals, _ = sharded_loftr_sweep(mesh, f1, f2, max_matches=256)
    counts = np.asarray((vals > args.loftr_threshold).sum(axis=1))[:n_pairs]
    wall = time.perf_counter() - t0
    return {
        "matcher": "loftr-sharded",
        "devices": int(ndev),
        "pairs": int(n_pairs),
        "pairs_per_s": round(n_pairs / wall, 2),
        "mean_matches": round(float(counts.mean()), 1),
        "min_matches": int(counts.min()),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=["tum", "kitti", "euroc"], required=True)
    p.add_argument("--path", required=True)
    p.add_argument("--matchers", default="orb,loftr")
    # Intrinsics auto-fill from KITTI calib.txt / EuRoC sensor.yaml when omitted.
    p.add_argument("--fx", type=float, default=None)
    p.add_argument("--fy", type=float, default=None)
    p.add_argument("--cx", type=float, default=None)
    p.add_argument("--cy", type=float, default=None)
    p.add_argument("--features", type=int, default=2000)
    p.add_argument("--ratio", type=float, default=0.6)
    p.add_argument("--min-ini-matches", type=int, default=100)
    p.add_argument("--model-fallback", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="fused steady-state tracking for the ORB matcher")
    p.add_argument("--fused-one-step", action="store_true",
                   help="one-program steady tracking (implies --fused; ORB only)")
    p.add_argument("--loftr-model", default=None,
                   help="override weights npz (default: repo checkpoint)")
    p.add_argument("--loftr-threshold", type=float, default=0.1)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--out-prefix", default="ab_traj")
    p.add_argument("--ate", action="store_true")
    p.add_argument(
        "--sharded-loftr",
        action="store_true",
        help="also run the mesh-sharded LoFTR pairwise sweep "
        "(parallel/sweep.py; BASELINE.json configs[4] multi-chip form)",
    )
    args = p.parse_args(argv)

    if None in (args.fx, args.fy, args.cx, args.cy):
        from mono_slam_framework_tpu.io.datasets import CALIB_LOADERS

        calib = CALIB_LOADERS.get(args.dataset)
        if calib is None:
            raise SystemExit("--fx/--fy/--cx/--cy are required for this dataset")
        fx, fy, cx, cy = calib(args.path)
        args.fx = args.fx if args.fx is not None else fx
        args.fy = args.fy if args.fy is not None else fy
        args.cx = args.cx if args.cx is not None else cx
        args.cy = args.cy if args.cy is not None else cy

    results = [run_one(m.strip(), args) for m in args.matchers.split(",") if m.strip()]
    if args.sharded_loftr:
        results.append(run_sharded_loftr(args))
    print(json.dumps({"sweep": results}, indent=2))
    return results


if __name__ == "__main__":
    main()
