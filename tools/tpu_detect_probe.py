"""TPU probe: time the whole-pyramid detect launch and the full one-step
steady program before/after the doubling-filter kernel rewrite.

Usage: python /tmp/tpu_detect_probe.py [BLOCK]
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

    from mono_slam_framework_tpu.ops import pallas_detect
    if len(sys.argv) > 1:
        b = int(sys.argv[1])
        pallas_detect.BLOCK = b
        pallas_detect._SMALL_ROWS = b + 2 * pallas_detect.HALO
        pallas_detect._WORK = b + 2 * pallas_detect.HALO
        pallas_detect._band_layout.cache_clear()
        print("BLOCK override:", b)

    from mono_slam_framework_tpu.ops import orb

    H, W = 480, 640
    MAXF = 2000
    rng = np.random.default_rng(1)
    base = np.kron(
        rng.uniform(0, 255, (H // 8, W // 8)).astype(np.float32), np.ones((8, 8))
    )
    imgs = [jnp.asarray(np.roll(base, 3 * i, axis=1), jnp.float32) for i in range(50)]

    # --- extract probe ---
    @jax.jit
    def extract(img):
        return orb.extract(img, MAXF)

    f = extract(imgs[0])
    float(jnp.sum(f.xy))
    t0 = time.perf_counter()
    for i in range(50):
        f = extract(imgs[i])
    float(jnp.sum(f.xy))
    dt = time.perf_counter() - t0
    print(f"extract: {dt/50*1000:.2f} ms/frame ({50/dt:.1f} FPS)")

    # --- full one-step steady program ---
    from mono_slam_framework_tpu.slam import fused_tracking

    prev_feats = orb.extract(imgs[0], MAXF)
    mcap, rcap, pcap, nk, mcap2 = 1024, 1024, 1024, 8, 1024
    prev_px = jnp.asarray(rng.integers(0, H * W, mcap), jnp.int32)
    prev_row = jnp.asarray(rng.integers(0, 700, mcap), jnp.int32)
    mp_pos = jnp.asarray(rng.uniform(-2, 2, (pcap, 3)) + [0, 0, 6], jnp.float32)
    T_init = jnp.eye(4, dtype=jnp.float32)
    kf_feats = jax.tree.map(lambda *xs: jnp.stack(xs), *([prev_feats] * nk))
    kf_px = jnp.asarray(rng.integers(0, H * W, (nk, mcap2)), jnp.int32)
    kf_row = jnp.asarray(rng.integers(0, 700, (nk, mcap2)), jnp.int32)
    first_slot = jnp.asarray(rng.integers(0, nk, rcap), jnp.int32)
    nrm = jnp.asarray(rng.normal(size=(rcap, 3)), jnp.float32)
    maxd = jnp.asarray(rng.uniform(1, 10, rcap), jnp.float32)
    Km = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], jnp.float32)

    def call(img):
        return fused_tracking.steady_step(
            img, prev_feats, prev_px, prev_row, mp_pos, T_init,
            kf_feats, kf_px, kf_row, first_slot, nrm, maxd, Km,
            0.7, W, float(W), float(H), True, MAXF, 20.0,
        )

    pk = call(imgs[0])[1]
    float(jnp.sum(pk))
    t0 = time.perf_counter()
    for i in range(50):
        pk = call(imgs[i])[1]
    float(jnp.sum(pk))
    dt = time.perf_counter() - t0
    print(f"steady one-step: {dt/50*1000:.2f} ms/frame ({50/dt:.1f} FPS)")


if __name__ == "__main__":
    main()
