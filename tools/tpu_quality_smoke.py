"""TPU smoke test for the in-process quality regimes (bench.py round 5).

Runs the hard-world quality arms on the session backend (TPU under axon)
with a small pose budget to (a) validate the 320x240/600-feature shapes
through the Pallas/fused paths and (b) warm the persistent compile cache
for the driver's bench run. Full-pose arms print timings.

Usage: python tools/tpu_quality_smoke.py [n_poses|full] [arm]
  arm in {default, fork, loftr, all}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mono_slam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mono_slam_framework_tpu.quality_bench import (
        run_quality,
        run_quality_loftr,
    )

    arg = sys.argv[1] if len(sys.argv) > 1 else "30"
    n_poses = None if arg == "full" else int(arg)
    arm = sys.argv[2] if len(sys.argv) > 2 else "all"

    print("backend:", jax.default_backend(), flush=True)
    out = {}
    if arm in ("default", "all"):
        t0 = time.perf_counter()
        out.update(run_quality(n_poses=n_poses, force_cpu=False))
        out["arm_default_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(out), flush=True)
    if arm in ("fork", "all"):
        t0 = time.perf_counter()
        out.update(
            {
                k + "_fork": v
                for k, v in run_quality(
                    n_poses=n_poses, force_cpu=False, fuse_duplicates=False
                ).items()
            }
        )
        out["arm_fork_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(out), flush=True)
    if arm in ("loftr", "all"):
        t0 = time.perf_counter()
        out.update(run_quality_loftr(force_cpu=False))
        out["arm_loftr_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
