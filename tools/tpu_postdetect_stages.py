"""TPU probe: split _post_detect into substages and time each standalone
(async throughput over 50 distinct inputs + one forcing readback), plus the
full extract and the steady one-step program. Identifies where the
remaining post-detect milliseconds go (VERDICT r4 #6).

Substages:
  topk      — batched cross-level approx_max_k + index decode
  subpix    — 5-tap Harris peak refinement + orientation gathers
  slab      — descriptor row-slab gather ([K, P, W] bf16 take)
  desccore  — one-hot MXU descriptor (_describe_onehot_core)
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
    budgets = orb._per_level_budget(MAXF)
    Vx, Ry, take_idx, R = orb._resize_band_tables(H, W)
    hi = jax.lax.Precision.HIGHEST

    def bands(img):
        x_stack = jnp.einsum(
            "hw,lxw->lhx", img.astype(jnp.float32), jnp.asarray(Vx), precision=hi
        )
        lvl = jnp.einsum("lrh,lhx->lrx", jnp.asarray(Ry), x_stack, precision=hi)
        flat_rows = jnp.concatenate(
            [lvl.reshape(orb.N_LEVELS * R, W), jnp.zeros((1, W), jnp.float32)]
        )
        return flat_rows[jnp.asarray(take_idx)]

    def detect(img):
        maps, _ = pallas_detect.detect_stage_multi_bands(
            bands(img), dims, 20.0, orb.BORDER
        )
        return maps

    maps0 = [jax.jit(detect)(im) for im in imgs]
    maps0 = [jax.tree.map(lambda x: x, m) for m in maps0]

    take_np, maxrows = orb._level_row_take(H, W)
    kmax = max(budgets)
    N_LEVELS = orb.N_LEVELS

    def stage_topk(maps):
        score = maps[0]
        score_pad = jnp.concatenate(
            [score, jnp.full((1, W), -jnp.inf, score.dtype)]
        )
        seg_all = score_pad[jnp.asarray(take_np)].reshape(
            N_LEVELS, maxrows * W
        )
        v_b, flat_b = jax.lax.approx_max_k(seg_all, kmax, recall_target=0.95)
        vals = jnp.concatenate([v_b[l, : budgets[l]] for l in range(N_LEVELS)])
        flat = jnp.concatenate([flat_b[l, : budgets[l]] for l in range(N_LEVELS)])
        ys = flat // W
        xs = flat - ys * W
        return vals, ys, xs

    tk0 = jax.jit(stage_topk)(maps0[0])

    base_np, hl_np, wl_np, scale_np, oct_np = orb._kp_level_tables(H, W, MAXF)
    base_j = jnp.asarray(base_np)
    hl_j = jnp.asarray(hl_np)
    wl_j = jnp.asarray(wl_np)

    def stage_subpix(maps, tk):
        vals, ys, xs = tk
        harris = maps[4]
        m10, m01 = maps[1], maps[2]
        hf = harris.reshape(-1)

        def at(dy, dx):
            yy2 = base_j + jnp.clip(ys + dy, 0, hl_j - 1)
            xx2 = jnp.clip(xs + dx, 0, wl_j - 1)
            return hf[yy2 * W + xx2]

        c0 = at(0, 0)

        def offset(m, p):
            denom = m - 2.0 * c0 + p
            denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
            return jnp.clip(0.5 * (m - p) / denom, -0.5, 0.5)

        xs_f = xs.astype(jnp.float32) + offset(at(0, -1), at(0, 1))
        ys_f = ys.astype(jnp.float32) + offset(at(-1, 0), at(1, 0))
        flat = (base_j + ys) * W + xs
        ang = jnp.arctan2(m01.reshape(-1)[flat], m10.reshape(-1)[flat])
        return xs_f, ys_f, ang

    sp0 = jax.jit(stage_subpix)(maps0[0], tk0)

    offs = jnp.arange(-orb.DESC_R, orb.DESC_R + 1)

    def stage_slab(maps, tk):
        vals, ys, xs = tk
        blur_q = jnp.round(maps[3])
        rows_g = base_j[:, None] + jnp.clip(
            ys[:, None] + offs[None, :], 0, hl_j[:, None] - 1
        )
        return jnp.take(blur_q, rows_g, axis=0).astype(jnp.bfloat16)

    sl0 = jax.jit(stage_slab)(maps0[0], tk0)

    def stage_desccore(slab, tk, sp):
        _, _, xs = tk
        _, _, ang = sp
        return orb._describe_onehot_core(slab, xs, ang, wl_j, W)

    dc0 = jax.jit(stage_desccore)(sl0, tk0, sp0)

    def timeit(name, fn, arglists, read, iters=50):
        out = fn(*arglists[0])
        float(read(out))
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(*arglists[i % len(arglists)])
        float(read(out))
        dt = time.perf_counter() - t0
        print(f"{name}: {dt/iters*1000:.2f} ms", flush=True)

    jd = jax.jit(detect)
    all_maps = [jd(im) for im in imgs]
    jtk = jax.jit(stage_topk)
    all_tk = [jtk(m) for m in all_maps]
    jsl = jax.jit(stage_slab)
    all_slab = [jsl(m, t) for m, t in zip(all_maps, all_tk)]
    jsp = jax.jit(stage_subpix)
    all_sp = [jsp(m, t) for m, t in zip(all_maps, all_tk)]

    timeit("detect(maps)", jd, [(im,) for im in imgs], lambda o: jnp.sum(o[0]))
    timeit("topk", jtk, [(m,) for m in all_maps], lambda o: jnp.sum(o[0]))
    timeit(
        "subpix+ang", jsp, list(zip(all_maps, all_tk)), lambda o: jnp.sum(o[0])
    )
    timeit(
        "slab", jsl, list(zip(all_maps, all_tk)),
        lambda o: jnp.sum(o.astype(jnp.float32)),
    )
    timeit(
        "desccore",
        jax.jit(stage_desccore),
        list(zip(all_slab, all_tk, all_sp)),
        lambda o: jnp.sum(o.astype(jnp.float32)),
    )

    @jax.jit
    def full(img):
        return orb.extract(img, MAXF)

    timeit("extract e2e", full, [(im,) for im in imgs], lambda o: jnp.sum(o.xy))


if __name__ == "__main__":
    main()
