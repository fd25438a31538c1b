"""TPU probe: per-substage timing of the ORB extract path.

Times (a) pyramid build + band gather, (b) the multi-band Pallas detect
launch, (c) the post-detect XLA stages (top-k, subpixel, orientation,
one-hot descriptor), and (d) extract end-to-end, at 640x480/2000 features.
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

    from mono_slam_framework_tpu.ops import orb, pallas_detect

    H, W = 480, 640
    MAXF = 2000
    rng = np.random.default_rng(1)
    base = np.kron(
        rng.uniform(0, 255, (H // 8, W // 8)).astype(np.float32), np.ones((8, 8))
    )
    imgs = [jnp.asarray(np.roll(base, 3 * i, axis=1), jnp.float32) for i in range(50)]

    dims = orb._level_dims(H, W)
    Vx, Ry, take_idx, R = orb._resize_band_tables(H, W)
    hi = jax.lax.Precision.HIGHEST

    @jax.jit
    def stage_bands(img):
        x_stack = jnp.einsum(
            "hw,lxw->lhx", img.astype(jnp.float32), jnp.asarray(Vx), precision=hi
        )
        lvl = jnp.einsum("lrh,lhx->lrx", jnp.asarray(Ry), x_stack, precision=hi)
        flat_rows = jnp.concatenate(
            [lvl.reshape(orb.N_LEVELS * R, W), jnp.zeros((1, W), jnp.float32)]
        )
        return flat_rows[jnp.asarray(take_idx)]

    @jax.jit
    def stage_detect(img_bands):
        (score, m10, m01, blur, harris), _ = pallas_detect.detect_stage_multi_bands(
            img_bands, dims, 20.0, orb.BORDER
        )
        return score, m10, m01, blur, harris

    @jax.jit
    def stage_post(maps):
        score, m10, m01, blur, harris = maps
        return orb._post_detect(score, m10, m01, blur, harris, H, W, MAXF)

    @jax.jit
    def full(img):
        return orb.extract(img, MAXF)

    def timeit(name, fn, inputs, read):
        out = fn(inputs[0])
        float(read(out))
        t0 = time.perf_counter()
        for i in range(50):
            out = fn(inputs[i % len(inputs)])
        float(read(out))
        dt = time.perf_counter() - t0
        print(f"{name}: {dt/50*1000:.2f} ms", flush=True)
        return out

    bands = timeit("pyramid+bands", stage_bands, imgs, lambda o: jnp.sum(o[0]))
    band_inputs = [stage_bands(im) for im in imgs[:8]]
    maps = timeit(
        "detect_multi_bands", stage_detect, band_inputs, lambda o: jnp.sum(o[3][0])
    )
    map_inputs = [stage_detect(b) for b in band_inputs]
    timeit("post_detect", stage_post, map_inputs, lambda o: jnp.sum(o.xy))
    timeit("extract e2e", full, imgs, lambda o: jnp.sum(o.xy))


if __name__ == "__main__":
    main()
