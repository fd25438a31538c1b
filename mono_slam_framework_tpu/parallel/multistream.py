"""Multi-stream batched steady-state tracking (the per-chip serving mode).

The reference runs ONE camera per process (src/main.cpp:100-188: one Webots
camera driving one System instance); serving N cameras costs N processes and
N GPUs' worth of per-stream latency. On TPU the steady-state tracking
program at 640x480/2000 features uses a fraction of the chip — the MXU
stages (Hamming distance matmul, one-hot descriptor sampling) and the
detection grid all scale with batch — so the TPU-native serving design
batches N independent streams' steady frames into ONE device program with
ONE packed readback:

  * extraction: all N streams' pyramid bands ride one Pallas detection grid
    (ops/pallas_detect.detect_stage_multi_bands with `n_streams`) and the
    pure-XLA post-detection stages (`ops/orb._post_detect`) vmap over the
    stream axis;
  * matching / association / pose LM: `jax.vmap` of
    `slam/fused_tracking._steady_core` with the XLA LM path pinned
    (`use_pallas=False`): under vmap the batched 6x6 solves vectorize,
    while the Pallas LM chain is a latency optimization for the
    single-stream case.

Because every stream's host-bound outputs pack into the same readback, the
host/relay round trip amortizes across the batch: per-chip serving capacity
is N x the batched per-stream rate for one round trip per tick. bench.py
reports `multistream8_aggregate_fps` on the real chip.

Beyond one chip, `steady_step_batch_sharded` / `steady_step_loftr_batch_
sharded` shard the stream axis over a `jax.sharding.Mesh` with `shard_map`:
each device runs the same batched program on its N/D streams with ZERO
collectives in the steady loop (streams are independent; LoFTR weights are
replicated once), so serving capacity scales linearly with mesh size over
ICI — the pod-level serving layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mono_slam_framework_tpu.ops import orb, pallas_detect
from mono_slam_framework_tpu.slam import fused_loftr, fused_tracking


def extract_batch(
    imgs,
    max_features: int,
    fast_threshold: float = 20.0,
    interpret: bool = False,
) -> orb.Features:
    """ORB extraction over a batch of images [N, H, W] -> Features with a
    leading stream axis. All N streams' pyramid bands run in ONE pallas
    grid; per-stream results are bit-identical to `orb._extract_multi`."""
    n, h0, w0 = imgs.shape
    dims = orb._level_dims(h0, w0)
    Vx, Ry, take_idx, R = orb._resize_band_tables(h0, w0)
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum(
        "nhw,lxw->nlhx", imgs.astype(jnp.float32), jnp.asarray(Vx), precision=hi
    )
    lvl = jnp.einsum("lrh,nlhx->nlrx", jnp.asarray(Ry), x, precision=hi)
    flat = jnp.concatenate(
        [
            lvl.reshape(n, orb.N_LEVELS * R, w0),
            jnp.zeros((n, 1, w0), jnp.float32),
        ],
        axis=1,
    )
    bands = flat[:, jnp.asarray(take_idx)]  # [n, B, WORK, w0]
    maps, _ = pallas_detect.detect_stage_multi_bands(
        bands.reshape((-1,) + bands.shape[2:]),
        dims,
        fast_threshold,
        orb.BORDER,
        interpret=interpret,
        n_streams=n,
    )
    tot = maps[0].shape[0] // n
    per_stream = tuple(m.reshape(n, tot, m.shape[1]) for m in maps)
    return jax.vmap(
        lambda s, a, b, c, d: orb._post_detect(
            s, a, b, c, d, h0, w0, max_features
        )
    )(*per_stream)


def _steady_batch_body(
    imgs,  # [N, H, W] f32
    prev_feats: orb.Features,  # leading [N] axis on every leaf
    prev_px,  # i32 [N, M]
    prev_row,  # i32 [N, M]
    mp_pos,  # f32 [N, P, 3]
    T_init,  # f32 [N, 4, 4]
    kf_feats: orb.Features,  # [N, NK, ...]
    kf_px,  # i32 [N, NK, M2]
    kf_row,  # i32 [N, NK, M2]
    first_slot,  # i32 [N, R]
    ctx_normal,  # f32 [N, R, 3]
    ctx_maxdist,  # f32 [N, R]
    K,  # f32 [N, 3, 3] per-stream intrinsics
    ratio: float,
    cols: int,
    width: float,
    height: float,
    use_octave_info: bool,
    max_features: int,
    fast_threshold: float,
    interpret: bool = False,
    use_pallas_lm: bool = False,
):
    if jax.default_backend() == "tpu" or interpret:
        feats = extract_batch(
            jnp.asarray(imgs, jnp.float32), max_features, fast_threshold,
            interpret,
        )
    else:
        # off-TPU (and not interpreting): the Pallas multi-band grid can't
        # compile; vmap the XLA extraction path instead — the same route
        # single-stream orb.extract takes on CPU backends
        feats = jax.vmap(
            lambda im: orb.extract(im, max_features, fast_threshold)
        )(jnp.asarray(imgs, jnp.float32))

    def core(cur, pf, ppx, prow, mpp, Ti, kff, kpx, krow, fs, nrm, mxd, Kb):
        return fused_tracking._steady_core(
            cur, pf, ppx, prow, mpp, Ti, kff, kpx, krow, fs, nrm, mxd, Kb,
            ratio, cols, width, height, use_octave_info,
            use_pallas_lm=use_pallas_lm,
        )

    return jax.vmap(core)(
        feats, prev_feats, prev_px, prev_row, mp_pos, T_init, kf_feats,
        kf_px, kf_row, first_slot, ctx_normal, ctx_maxdist, K,
    )


_STEADY_STATICS = (
    "ratio", "cols", "width", "height", "use_octave_info",
    "max_features", "fast_threshold", "interpret", "use_pallas_lm",
)

# the persistent compile cache keys include the jitted function name; keep
# the pre-refactor name so warm caches stay warm
_steady_batch_body.__name__ = "steady_step_batch"
_steady_batch_body.__qualname__ = "steady_step_batch"

steady_step_batch = functools.partial(
    jax.jit, static_argnames=_STEADY_STATICS
)(_steady_batch_body)
steady_step_batch.__doc__ = """N streams' `fused_tracking.steady_step` as ONE program.

Same per-stream packed layout and chain outputs as `steady_step`, with
a leading [N] axis; ONE dispatch + ONE readback serves all N streams.
`use_pallas_lm=True` vmaps the Pallas LM kernel (a leading grid axis)
instead of the batched XLA solves — measure before preferring it.
"""


def _loftr_batch_body(
    imgs,  # [N, H, W] f32
    params,  # LoFTR weight dict (shared across streams)
    f_prev,  # [N, 1, L, C]
    prev_cellrow,  # i32 [N, L]
    mp_pos,  # f32 [N, P, 3]
    T_init,  # f32 [N, 4, 4]
    kf_feats,  # f32 [N, NK, L, C]
    kf_cellrow,  # i32 [N, NK, L]
    first_slot,  # i32 [N, R]
    ctx_normal,  # f32 [N, R, 3]
    ctx_maxdist,  # f32 [N, R]
    cell_uv,  # f32 [L, 2] (shared: the coarse-cell grid geometry)
    K,  # f32 [N, 3, 3]
    info_val,  # f32 scalar
    threshold: float,
    width: float,
    height: float,
    resize_hw: tuple | None = None,
):
    x = jnp.asarray(imgs, jnp.float32)
    if resize_hw is not None:
        x = jax.vmap(lambda im: jax.image.resize(im, resize_hw, "bilinear"))(x)
    f_cur = fused_loftr.loftr_native.encode(params, (x / 255.0)[:, None])
    # [N, L, C] -> per-stream [1, L, C] via vmap's added axis

    def core(fc, fp, pcr, mpp, Ti, kff, kcr, fs, nrm, mxd, Kb):
        return fused_loftr._loftr_core(
            fc[None], params, fp, pcr, mpp, Ti, kff, kcr, fs, nrm, mxd,
            cell_uv, Kb, info_val, threshold, width, height,
            use_pallas_lm=False,
        )

    return jax.vmap(core)(
        f_cur, f_prev, prev_cellrow, mp_pos, T_init, kf_feats, kf_cellrow,
        first_slot, ctx_normal, ctx_maxdist, K,
    )


_LOFTR_STATICS = ("threshold", "width", "height", "resize_hw")

_loftr_batch_body.__name__ = "steady_step_loftr_batch"
_loftr_batch_body.__qualname__ = "steady_step_loftr_batch"

steady_step_loftr_batch = functools.partial(
    jax.jit, static_argnames=_LOFTR_STATICS
)(_loftr_batch_body)
steady_step_loftr_batch.__doc__ = """N streams' `fused_loftr.steady_step_loftr` as ONE program.

The backbone encode batches naturally over streams (one conv stack at
batch N instead of N sequential passes — the classic MXU win), and the
transformer/pose stages vmap. Same per-stream packed layout as the
single-stream program, with a leading [N] axis."""


# ---- pod-scale serving: streams sharded over a device mesh ----------------


def steady_step_batch_sharded(mesh, *args, axis: str = "data", **statics):
    """`steady_step_batch` with the stream axis sharded over `mesh`.

    Every array argument carries streams on axis 0 (per-stream intrinsics
    included), so the whole argument list shards with one spec and the
    steady loop runs with ZERO collectives: D devices serve D x the per-chip
    batch for the same program latency. N must be divisible by mesh size.
    """
    body = functools.partial(_steady_batch_body, **statics)
    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=P(axis),
            out_specs=P(axis),
            # the Pallas detection launch inside the body cannot annotate
            # varying-mesh-axes metadata; the program is pure per-stream
            # data parallelism, so the check adds nothing here
            check_vma=False,
        )
    )
    return fn(*args)


def steady_step_loftr_batch_sharded(
    mesh, imgs, params, *args, axis: str = "data", **statics
):
    """`steady_step_loftr_batch` sharded over `mesh`: stream tensors split
    on axis 0, LoFTR weights and the coarse-cell grid replicated (the only
    broadcast; it happens once at dispatch, not per frame).

    Argument order matches `steady_step_loftr_batch`."""
    body = functools.partial(_loftr_batch_body, **statics)
    # cell_uv [L,2] and info_val (scalar) are shared; everything else is
    # per-stream. Build specs by matching _loftr_batch_body's positionals.
    n_pos = 12  # f_prev .. info_val after (imgs, params)
    assert len(args) == n_pos, f"expected {n_pos} positional args, got {len(args)}"
    specs = [P(axis), P()]  # imgs sharded, params replicated
    # f_prev, prev_cellrow, mp_pos, T_init, kf_feats, kf_cellrow,
    # first_slot, ctx_normal, ctx_maxdist -> sharded;
    # cell_uv + info_val replicated; per-stream K sharded
    specs += [P(axis)] * 9 + [P(), P(axis), P()]
    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=tuple(specs),
            out_specs=P(axis),
        )
    )
    return fn(imgs, params, *args)
