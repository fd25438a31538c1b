"""TPU probe: A/B the post-detect descriptor-slab selection strategies
(orb.SLAB_MODE) inside the FULL extract program, plus the steady one-step
program that bench.py reports. Round-2 history says gather-vs-einsum
verdicts flip between standalone and fused contexts — measure fused.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/mono_slam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mono_slam_framework_tpu.ops import orb

    H, W = 480, 640
    MAXF = 2000
    rng = np.random.default_rng(1)
    base = np.kron(
        rng.uniform(0, 255, (H // 8, W // 8)).astype(np.float32), np.ones((8, 8))
    )
    imgs = [jnp.asarray(np.roll(base, 3 * i, axis=1), jnp.float32) for i in range(50)]

    def timeit(name, fn, inputs, read, iters=50):
        out = fn(inputs[0])
        float(read(out))
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(inputs[i % len(inputs)])
        float(read(out))
        dt = time.perf_counter() - t0
        print(f"{name}: {dt/iters*1000:.2f} ms", flush=True)

    for mode in ("take", "loop"):
        orb.SLAB_MODE = mode

        # distinct jit names per mode: the persistent compile cache keys
        # include the decorated function name
        def make(mode):
            def f(img):
                return orb.extract(img, MAXF)
            f.__name__ = f"extract_slab_{mode}"
            return jax.jit(f)

        timeit(f"extract[{mode}]", make(mode), imgs, lambda o: jnp.sum(o.xy))


if __name__ == "__main__":
    main()
