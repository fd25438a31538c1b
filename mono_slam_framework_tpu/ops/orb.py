"""Oriented-BRIEF (ORB) feature extraction as one batched fixed-shape program.

Replaces cv::ORB::create()->detectAndCompute (reference matcher plugin,
src/featurematcher.cpp:4,15-17; OpenCV defaults: 500 features, 8 levels,
scale 1.2, Harris ranking, intensity-centroid orientation, rBRIEF).

TPU design notes:
  * each pyramid level runs at its true resolution inside one jitted program;
    on TPU the full-image stage (FAST + Harris + NMS + moments + blur) is the
    fused Pallas kernel in ops/pallas_detect (one VMEM-resident pass);
  * orientation uses square-patch intensity moments (the circular patch of
    OpenCV is approximated by its bounding square), computed as full-image
    maps so per-keypoint work is two gathers — no patch extraction;
  * keypoint selection uses `approx_max_k` (the TPU-native selection
    primitive) per level with OpenCV's geometric per-level budgets;
  * descriptors sample a pre-blurred level at 256 shared rotated pattern points per
    keypoint — one flat gather, no per-keypoint control flow;
  * the rBRIEF test pattern is a fixed seeded Gaussian pattern (the ORB paper
    construction), NOT OpenCV's learned table; both frames use the same
    pattern so matching is self-consistent.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mono_slam_framework_tpu.ops import fast, filters

N_LEVELS = 8
SCALE_FACTOR = 1.2
PATCH_RADIUS = 15  # intensity-centroid patch (HALF_PATCH_SIZE)
BORDER = 31  # edgeThreshold
N_BITS = 256
# max |rotated rBRIEF offset|: pattern points are clipped to [-13,13] and
# |round(13*cos + 13*sin)| <= round(13*sqrt(2)) = 18
DESC_R = 18
DESC_P = 2 * DESC_R + 1


class Features(NamedTuple):
    """Fixed-capacity feature set for one image (a pytree leaf bundle)."""

    xy: jax.Array  # f32 [K, 2] level-0 pixel coords
    angle: jax.Array  # f32 [K] orientation (radians)
    desc: jax.Array  # uint32 [K, 8] packed 256-bit rBRIEF
    score: jax.Array  # f32 [K] Harris response
    valid: jax.Array  # bool [K]
    octave: jax.Array  # i32 [K] pyramid level (sigma2 = 1.2^(2*octave))


@functools.lru_cache(maxsize=None)
def _brief_pattern_np(seed: int = 1234):
    """(points [256, 2] (yx), perm [256]) — shared-point rBRIEF pattern.

    Gaussian offsets (sigma patch/5, the ORB paper construction) with bit i
    comparing point[i] against point[perm[i]] (a fixed derangement). Reusing
    the 256 sampled points across pairs halves the gather count per keypoint
    (512 -> 256 image samples) — the descriptor gather is the dominant cost
    of extraction on TPU.
    """
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, (2 * PATCH_RADIUS + 1) / 5.0, size=(N_BITS, 2))
    pts = np.clip(np.round(pts), -13, 13).astype(np.float32)
    perm = rng.permutation(N_BITS)
    # make it a derangement so no bit compares a point with itself
    fixed = np.nonzero(perm == np.arange(N_BITS))[0]
    for i in fixed:
        j = (i + 1) % N_BITS
        perm[i], perm[j] = perm[j], perm[i]
    return pts, perm.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _level_dims(h0: int, w0: int):
    return [
        (int(round(h0 / SCALE_FACTOR**l)), int(round(w0 / SCALE_FACTOR**l)))
        for l in range(N_LEVELS)
    ]


@functools.lru_cache(maxsize=None)
def _interior_mask_np(h0: int, w0: int, border: int):
    """[L, H, W] mask of each level's detection interior inside the pad."""
    masks = np.zeros((N_LEVELS, h0, w0), bool)
    for l, (hl, wl) in enumerate(_level_dims(h0, w0)):
        masks[l, border : hl - border, border : wl - border] = True
    return masks


def _per_level_budget(total: int):
    """Geometric per-level feature budgets (OpenCV's distribution)."""
    q = 1.0 / SCALE_FACTOR
    raw = np.array([q**i for i in range(N_LEVELS)])
    raw = raw / raw.sum() * total
    budget = np.maximum(np.round(raw).astype(int), 1)
    budget[-1] = max(total - budget[:-1].sum(), 1)
    return [int(b) for b in budget]


def _moment_maps(img):
    """Square-patch intensity moments (m10, m01) via one grouped separable
    31-tap conv pair over a 2-channel stack."""
    r = PATCH_RADIUS
    ones = jnp.ones(2 * r + 1, img.dtype)
    # lax convs are cross-correlations: the raw ramp gives m10 = sum dx*I(x+dx)
    ramp = jnp.arange(-r, r + 1, dtype=img.dtype)
    out = filters.depthwise_sep_conv(
        jnp.stack([img, img]),
        jnp.stack([ramp, ones]),  # kx per channel
        jnp.stack([ones, ramp]),  # ky per channel
    )
    return out[0], out[1]


def _rotated_offsets(ang):
    """Rotated rBRIEF sample offsets for per-keypoint angles ang [...]:
    (ry, rx) int32 [..., 256] in [-DESC_R, DESC_R], plus the bit-pair perm."""
    pts_np, perm_np = _brief_pattern_np()
    pat = jnp.asarray(pts_np)  # [256, 2] (yx)
    c, s = jnp.cos(ang), jnp.sin(ang)
    py = pat[None, :, 0]
    px = pat[None, :, 1]
    rx = jnp.round(px * c[..., None] - py * s[..., None]).astype(jnp.int32)
    ry = jnp.round(px * s[..., None] + py * c[..., None]).astype(jnp.int32)
    return ry, rx, jnp.asarray(perm_np)


def _pack_bits(samples, perm):
    """Bit i compares sample point i against point perm[i]; pack to u32[...,8]."""
    bits = (samples < samples[..., perm]).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)  # broadcasts over leading dims
    return jnp.sum(
        bits.reshape(*samples.shape[:-1], 8, 32) << shifts,
        axis=-1,
        dtype=jnp.uint32,
    )


def _extract_level(
    img_l, k_l: int, fast_threshold: float, use_fused: bool, onehot_desc: bool
):
    """Detection + orientation (+ descriptors on the gather path) for one
    pyramid level.

    Runs at the level's true resolution (padding the stack to level-0 size
    costs 2.5x the pixels and measures slower on TPU than 8 lean per-level
    programs fused into one jit). On TPU the full-image stage (FAST + Harris
    + NMS + moments + blur) is one fused Pallas kernel (ops/pallas_detect).

    Returns (xs, ys, xs_f, ys_f, ang, desc, vals, valid, slab): on the
    gather path `desc` is the packed [k,8] u32 descriptor and `slab` is
    None; with `onehot_desc` the descriptor moves to a level-batched MXU
    stage in `extract` and `slab` is the row-selected blur slab
    [k, DESC_P, w] (bf16; rows ys-18..ys+18, border-clipped).
    """
    h, w = img_l.shape
    if use_fused:
        from mono_slam_framework_tpu.ops import pallas_detect

        score, m10, m01, blur, harris = pallas_detect.detect_stage(
            img_l, fast_threshold, BORDER
        )
    else:
        is_corner, _ = fast.fast_score_map(img_l, fast_threshold)
        harris = fast.harris_response(img_l)
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        inside = (
            (yy >= BORDER) & (yy < h - BORDER) & (xx >= BORDER) & (xx < w - BORDER)
        )
        cand = jnp.where(is_corner & inside, harris, -jnp.inf)
        nms = cand >= filters.max_pool_3x3_same(cand)
        score = jnp.where(nms, cand, -jnp.inf)
        m10, m01 = _moment_maps(img_l)
        blur = filters.gaussian_blur(img_l)

    vals, flat_idx = jax.lax.approx_max_k(
        score.reshape(-1), k_l, recall_target=0.95
    )
    ys = flat_idx // w
    xs = flat_idx - ys * w
    valid = jnp.isfinite(vals)

    # subpixel peak refinement on the raw Harris surface (quadratic fit per
    # axis, offset clamped to +-0.5). The MatchFrames interface still carries
    # integers; the float coordinates ride along as measurements for the
    # geometry stages (see QUIRKS.md / KNOWN_ISSUES.md round-2 plan).
    hf = harris.reshape(-1)

    def at(dy, dx):
        yy2 = jnp.clip(ys + dy, 0, h - 1)
        xx2 = jnp.clip(xs + dx, 0, w - 1)
        return hf[yy2 * w + xx2]

    c0 = at(0, 0)

    def offset(m, p):
        denom = m - 2.0 * c0 + p
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
        return jnp.clip(0.5 * (m - p) / denom, -0.5, 0.5)

    dx_off = offset(at(0, -1), at(0, 1))
    dy_off = offset(at(-1, 0), at(1, 0))
    xs_f = xs.astype(jnp.float32) + dx_off
    ys_f = ys.astype(jnp.float32) + dy_off

    # orientation via the moment maps (2 gathers per keypoint)
    flat = ys * w + xs
    ang = jnp.arctan2(m01.reshape(-1)[flat], m10.reshape(-1)[flat])

    # descriptors sample the blur ROUNDED to integers: ints <= 255 are exact
    # in bf16, which makes the MXU one-hot sampling path below bit-identical
    # to the gather path (QUIRKS.md: quantized-blur rBRIEF)
    blur_q = jnp.round(blur)

    if onehot_desc:
        # stage 1 of the one-hot MXU descriptor: select each keypoint's
        # DESC_P blur rows as one bf16 matmul (XLA's per-element gather is
        # ~7 ns/sample on TPU; one-hot matmuls beat it ~4x end to end)
        rows = jnp.clip(
            ys[:, None] + jnp.arange(-DESC_R, DESC_R + 1)[None, :], 0, h - 1
        )  # [k, P]
        Ey = (rows[:, :, None] == jnp.arange(h)[None, None, :]).astype(
            jnp.bfloat16
        )
        slab = jnp.einsum(
            "kph,hw->kpw",
            Ey,
            blur_q.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        return xs, ys, xs_f, ys_f, ang, None, vals, valid, slab

    # gather path (fast on CPU; reference for the one-hot path)
    ry, rx, perm = _rotated_offsets(ang)
    sx = jnp.clip(xs[:, None] + rx, 0, w - 1)  # [k,256]
    sy = jnp.clip(ys[:, None] + ry, 0, h - 1)
    samples = blur_q.reshape(-1)[((sy * w) + sx).reshape(-1)].reshape(k_l, N_BITS)
    packed = _pack_bits(samples, perm)
    return xs, ys, xs_f, ys_f, ang, packed, vals, valid, None


def _describe_onehot(slabs, all_xs, all_ang, dims, budgets, w0):
    """Stages 2-3 of the one-hot MXU descriptor, batched over ALL levels.

    slabs: per-level [k_l, DESC_P, w_l] bf16 blur-row slabs (stage 1).
    Column selection and in-patch rotated sampling are one-hot bf16 matmuls
    (exact: blur values are integers <= 255, exactly representable in bf16),
    so the result is bit-identical to the per-element gather path while the
    work rides the MXU instead of XLA's scalar gather lowering.
    """
    slab = jnp.concatenate(
        [jnp.pad(s, ((0, 0), (0, 0), (0, w0 - s.shape[2]))) for s in slabs]
    )  # [K, P, w0]
    xs = jnp.concatenate(all_xs)  # [K]
    ang = jnp.concatenate(all_ang)
    wl = jnp.asarray(
        np.concatenate(
            [np.full(budgets[l], dims[l][1], np.int32) for l in range(N_LEVELS)]
        )
    )
    return _describe_onehot_core(slab, xs, ang, wl, w0)


def _describe_onehot_core(slab, xs, ang, wl, w0):
    """One-hot MXU descriptor stages 2-3 over a w0-wide slab [K, P, w0]."""
    P = DESC_P
    # stage 2: per-keypoint column one-hot -> [K, P, P] patch
    cols = jnp.clip(
        xs[:, None] - DESC_R + jnp.arange(P)[None, :], 0, wl[:, None] - 1
    )  # [K, P]
    Ex = (cols[:, :, None] == jnp.arange(w0)[None, None, :]).astype(jnp.bfloat16)
    patch = jnp.einsum(
        "kpw,kqw->kpq", slab, Ex, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    # stage 3: rotated sample points as separable one-hots over the patch.
    # Row/col clips compose exactly with the final-coordinate clip of the
    # gather path: patch[p, q] = blur[clip(y-R+p), clip(x-R+q)] and
    # p = ry+R, q = rx+R with |ry|,|rx| <= R.
    ry, rx, perm = _rotated_offsets(ang)  # [K, 256]
    Oy = ((ry + DESC_R)[:, :, None] == jnp.arange(P)[None, None, :]).astype(
        jnp.bfloat16
    )
    Ox = ((rx + DESC_R)[:, :, None] == jnp.arange(P)[None, None, :]).astype(
        jnp.bfloat16
    )
    tmp = jnp.einsum(
        "ksp,kpq->ksq", Oy, patch, preferred_element_type=jnp.float32
    )  # [K, 256, P]
    samples = jnp.einsum("ksq,ksq->ks", tmp, Ox.astype(jnp.float32))
    return _pack_bits(samples, perm)


@functools.lru_cache(maxsize=None)
def _kp_level_tables(h0: int, w0: int, max_features: int):
    """Static per-keypoint level-geometry arrays (level-major layout)."""
    from mono_slam_framework_tpu.ops import pallas_detect

    dims = _level_dims(h0, w0)
    budgets = _per_level_budget(max_features)
    _, _, _, starts, _, _, _ = pallas_detect._band_layout(tuple(dims))
    rep = lambda vals, dt: np.concatenate(
        [np.full(budgets[l], vals[l], dt) for l in range(N_LEVELS)]
    )
    return (
        rep(starts, np.int32),  # base output row of each kp's level
        rep([h for h, _ in dims], np.int32),
        rep([w for _, w in dims], np.int32),
        rep([SCALE_FACTOR**l for l in range(N_LEVELS)], np.float32),
        rep(list(range(N_LEVELS)), np.int32),
    )


def _bilinear_weight_mat(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] bilinear (antialiased triangle) resize weights — the numpy
    twin of jax.image.resize(..., method="bilinear")'s per-axis weight
    matrix (jax._src.image.scale.compute_weight_mat with scale=out/in,
    translation 0). Kept in numpy so the lru-cached table build never
    touches a jax backend (the relay-cached CPU AOT executables are built
    for a different host CPU)."""
    scale = out_size / in_size
    inv_scale = 1.0 / scale
    kernel_scale = max(inv_scale, 1.0)  # antialias widens when downscaling
    sample_f = (np.arange(out_size) + 0.5) * inv_scale - 0.5
    x = (
        np.abs(sample_f[:, None] - np.arange(in_size)[None, :]) / kernel_scale
    )
    weights = np.maximum(0.0, 1.0 - x)
    total = weights.sum(axis=1, keepdims=True)
    weights = np.where(np.abs(total) > 1e-6, weights / total, 0.0)
    ok = (sample_f >= -0.5) & (sample_f <= in_size - 0.5)
    return (weights * ok[:, None]).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _resize_band_tables(h0: int, w0: int):
    """Static tables that turn the pyramid build + band gather into two
    batched MXU matmuls and one row-take.

    Returns (Vx [L, w0, w0], Ry [L, R, h0], take_idx [B, WORK], R): per-level
    column/row resize weight matrices (rows past the level's true size are
    zero); bilinear resize is linear, so applying these matrices reproduces
    jax.image.resize per axis. take_idx maps each band work-window row to a
    row of the flattened [L*R (+1 zero row), w0] level stack.
    """
    from mono_slam_framework_tpu.ops import pallas_detect

    dims = _level_dims(h0, w0)
    BL, HALO = pallas_detect.BLOCK, pallas_detect.HALO
    WORK = BL + 2 * HALO
    nb = [-(-h // BL) for h, _ in dims]
    R = max(nb) * BL
    L = N_LEVELS
    Vx = np.zeros((L, w0, w0), np.float32)
    Ry = np.zeros((L, R, h0), np.float32)
    for l, (h_l, w_l) in enumerate(dims):
        Vx[l, :w_l] = _bilinear_weight_mat(w0, w_l)
        Ry[l, :h_l] = _bilinear_weight_mat(h0, h_l)
    zero_row = L * R
    take = np.full((sum(nb), WORK), zero_row, np.int32)
    b = 0
    for l, (h_l, _) in enumerate(dims):
        for bb in range(nb[l]):
            rows = bb * BL - HALO + np.arange(WORK)
            ok = (rows >= 0) & (rows < h_l)
            take[b, ok] = l * R + rows[ok]
            b += 1
    return Vx, Ry, take, R


def _extract_multi(
    img, max_features: int, fast_threshold: float, interpret: bool = False
) -> Features:
    """TPU extraction with ALL pyramid levels' detection in ONE pallas
    launch and the post-detection stages batched across levels.

    Numerically identical to the per-level fused path (same per-band kernel
    math, same one-hot descriptor); the per-level path serializes 8 pallas
    launches + 8 small XLA op chains, which is latency-bound on TPU.
    """
    from mono_slam_framework_tpu.ops import pallas_detect

    h0, w0 = img.shape
    dims = _level_dims(h0, w0)
    budgets = _per_level_budget(max_features)
    # pyramid build + band-window gather as two batched MXU matmuls + one
    # take (7 sequential jax.image.resize ops measured ~1.2 ms on-device;
    # this is ~0.1 ms). HIGHEST precision keeps f32 resize numerics.
    Vx, Ry, take_idx, R = _resize_band_tables(h0, w0)
    hi = jax.lax.Precision.HIGHEST
    x_stack = jnp.einsum(
        "hw,lxw->lhx", img.astype(jnp.float32), jnp.asarray(Vx), precision=hi
    )
    lvl = jnp.einsum("lrh,lhx->lrx", jnp.asarray(Ry), x_stack, precision=hi)
    flat_rows = jnp.concatenate(
        [lvl.reshape(N_LEVELS * R, w0), jnp.zeros((1, w0), jnp.float32)]
    )
    img_bands = flat_rows[jnp.asarray(take_idx)]  # [B, WORK, w0]
    (score, m10, m01, blur, harris), starts = (
        pallas_detect.detect_stage_multi_bands(
            img_bands, dims, fast_threshold, BORDER, interpret=interpret
        )
    )
    return _post_detect(score, m10, m01, blur, harris, h0, w0, max_features)


@functools.lru_cache(maxsize=None)
def _level_row_take(h0: int, w0: int):
    """[L, maxrows] row-take table: level l's score/band rows in the stacked
    map (pad slots point at row `tot`, one past the stack — callers append a
    pad row). Turns the per-level slice loop into ONE batched take."""
    from mono_slam_framework_tpu.ops import pallas_detect

    dims = _level_dims(h0, w0)
    _, _, _, starts, nbands, _, tot = pallas_detect._band_layout(tuple(dims))
    maxrows = max(nbands) * pallas_detect.BLOCK
    take = np.full((N_LEVELS, maxrows), tot, np.int32)
    for l in range(N_LEVELS):
        nr = nbands[l] * pallas_detect.BLOCK
        take[l, :nr] = starts[l] + np.arange(nr)
    return take, maxrows


# descriptor row-slab selection strategy on the multi-level path; probed on
# the real chip (tools/tpu_postdetect_probe.py), best kept as default.
# "take": ONE row-gather over the stacked blur map for ALL keypoints;
# "loop": 8 serialized per-level one-hot einsums (bit-identical values).
SLAB_MODE = "take"


def _post_detect(
    score, m10, m01, blur, harris, h0: int, w0: int, max_features: int
) -> Features:
    """Post-detection extraction stages over the stacked level maps from
    `detect_stage_multi_bands`: per-level top-k, subpixel peak refinement,
    orientation, and the one-hot MXU descriptor. Pure XLA (no pallas), so it
    vmaps over a leading stream axis — the multi-stream batched path
    (parallel/multistream.py) runs ALL streams' bands in one pallas grid and
    vmaps this function over the per-stream maps."""
    from mono_slam_framework_tpu.ops import pallas_detect

    dims = _level_dims(h0, w0)
    budgets = _per_level_budget(max_features)
    _, _, _, starts, _, _, _ = pallas_detect._band_layout(tuple(dims))
    W = score.shape[1]

    # ALL levels' top-k as ONE batched approx_max_k over a [L, maxrows*W]
    # row-take view (pad slots read a -inf row); the previous 8 serialized
    # per-level calls were the dominant latency chain of this stage
    take_np, maxrows = _level_row_take(h0, w0)
    kmax = max(budgets)
    score_pad = jnp.concatenate([score, jnp.full((1, W), -jnp.inf, score.dtype)])
    seg_all = score_pad[jnp.asarray(take_np)].reshape(N_LEVELS, maxrows * W)
    v_b, flat_b = jax.lax.approx_max_k(seg_all, kmax, recall_target=0.95)
    vals_l = [v_b[l, : budgets[l]] for l in range(N_LEVELS)]
    flat_l = [flat_b[l, : budgets[l]] for l in range(N_LEVELS)]
    ys_l = [f // W for f in flat_l]
    vals = jnp.concatenate(vals_l)
    ys = jnp.concatenate(ys_l)  # level-local rows
    xs = jnp.concatenate(flat_l) - ys * W
    valid = jnp.isfinite(vals)

    base_np, hl_np, wl_np, scale_np, oct_np = _kp_level_tables(
        h0, w0, max_features
    )
    base = jnp.asarray(base_np)
    hl = jnp.asarray(hl_np)
    wl = jnp.asarray(wl_np)

    # subpixel peak refinement on the concatenated Harris surface — one
    # gather per tap for ALL levels' keypoints
    hf = harris.reshape(-1)

    def at(dy, dx):
        yy2 = base + jnp.clip(ys + dy, 0, hl - 1)
        xx2 = jnp.clip(xs + dx, 0, wl - 1)
        return hf[yy2 * W + xx2]

    c0 = at(0, 0)

    def offset(m, p):
        denom = m - 2.0 * c0 + p
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
        return jnp.clip(0.5 * (m - p) / denom, -0.5, 0.5)

    xs_f = xs.astype(jnp.float32) + offset(at(0, -1), at(0, 1))
    ys_f = ys.astype(jnp.float32) + offset(at(-1, 0), at(1, 0))

    flat = (base + ys) * W + xs
    ang = jnp.arctan2(m01.reshape(-1)[flat], m10.reshape(-1)[flat])

    # descriptors: quantized blur (ints exact in bf16 -> MXU one-hot path
    # bit-identical to the gather path)
    blur_q = jnp.round(blur)
    offs = jnp.arange(-DESC_R, DESC_R + 1)
    if SLAB_MODE == "take":
        # ONE row-gather for ALL keypoints: global blur row = band start +
        # level-clipped local row (identical values to the one-hot einsums)
        rows_g = base[:, None] + jnp.clip(ys[:, None] + offs[None, :], 0, hl[:, None] - 1)
        slab = jnp.take(blur_q, rows_g, axis=0).astype(jnp.bfloat16)  # [K,P,W]
    else:
        slabs = []
        for l in range(N_LEVELS):
            h_l = dims[l][0]
            seg = jax.lax.slice_in_dim(blur_q, starts[l], starts[l] + h_l)
            rows = jnp.clip(
                ys_l[l][:, None] + offs[None, :], 0, h_l - 1
            )  # [k_l, P]
            Ey = (rows[:, :, None] == jnp.arange(h_l)[None, None, :]).astype(
                jnp.bfloat16
            )
            slabs.append(
                jnp.einsum(
                    "kph,hw->kpw",
                    Ey,
                    seg.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
            )
        slab = jnp.concatenate(slabs)
    desc = _describe_onehot_core(slab, xs, ang, wl, W)

    xy0 = jnp.stack([xs_f, ys_f], -1) * jnp.asarray(scale_np)[:, None]
    return Features(
        xy=xy0,
        angle=ang,
        desc=desc,
        score=jnp.where(valid, vals, -jnp.inf),
        valid=valid,
        octave=jnp.asarray(oct_np),
    )


def extract(
    img,
    max_features: int,
    fast_threshold: float = 20.0,
    use_fused: bool | None = None,
    onehot_desc: bool | None = None,
) -> Features:
    """ORB features over an 8-level pyramid. img: [H, W] f32 grayscale.

    Jit-friendly: static shapes throughout; returns exactly the summed
    per-level budgets worth of slots with a validity mask. `use_fused`
    selects the Pallas fused detection kernel (default: on TPU backends);
    `onehot_desc` selects the MXU one-hot descriptor sampling (default:
    follows use_fused — XLA's gather lowering is the dominant extract cost
    on TPU, while the gather path wins on CPU). Both descriptor paths are
    bit-identical (quantized-blur rBRIEF, see QUIRKS.md).
    """
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu"
    if onehot_desc is None:
        onehot_desc = use_fused
    if use_fused and onehot_desc:
        return _extract_multi(img, max_features, fast_threshold)
    h0, w0 = img.shape
    dims = _level_dims(h0, w0)
    budgets = _per_level_budget(max_features)

    all_xy, all_ang, all_desc, all_score, all_valid = [], [], [], [], []
    all_oct, all_xs, slabs = [], [], []
    for l in range(N_LEVELS):
        scale = SCALE_FACTOR**l
        if l == 0:
            img_l = img
        else:
            img_l = filters.resize_bilinear(img, dims[l])
        xs, ys, xs_f, ys_f, ang, desc, vals, valid, slab = _extract_level(
            img_l, budgets[l], fast_threshold, use_fused, onehot_desc
        )
        xy0 = jnp.stack([xs_f, ys_f], -1) * scale
        all_xy.append(xy0)
        all_ang.append(ang)
        all_desc.append(desc)
        all_score.append(jnp.where(valid, vals, -jnp.inf))
        all_valid.append(valid)
        all_oct.append(jnp.full((budgets[l],), l, jnp.int32))
        all_xs.append(xs)
        slabs.append(slab)

    desc = (
        _describe_onehot(slabs, all_xs, all_ang, dims, budgets, w0)
        if onehot_desc
        else jnp.concatenate(all_desc)
    )
    return Features(
        xy=jnp.concatenate(all_xy),
        angle=jnp.concatenate(all_ang),
        desc=desc,
        score=jnp.concatenate(all_score),
        valid=jnp.concatenate(all_valid),
        octave=jnp.concatenate(all_oct),
    )
