"""Fused Pallas detection kernel: FAST-9 + Harris + NMS + blur + moments.

One Pallas program per pyramid level producing everything the ORB front-end
needs from the full image:

  score  — Harris response at FAST corners after 3x3 NMS (-inf elsewhere)
  m10/m01 — square-patch intensity moments (orientation)
  blur   — 7x7 Gaussian (rBRIEF sampling source)

The XLA version of this stage is ~8 separate kernel chains per level, each
round-tripping the image through HBM. Here the level image sits in VMEM and
the stage is pure VPU work (rolls + elementwise).

VMEM budget: the naive whole-image kernel keeps ~50 image-sized intermediates
live (16-point FAST ring, Harris products, moment accumulators) — 65 MB of
scoped VMEM for a 640x480 level, 4x over the 16 MB budget. So large levels run
on a 1-D row-band grid: each program slices a (BLOCK + 2*HALO)-row work window
out of the VMEM-resident image (no DMA choreography needed) and writes one
BLOCK-row band of each output; intermediates shrink by H/BLOCK. Small levels
(<= _SMALL_ROWS rows) use a single whole-image program.

Neighborhood access is expressed as circular rolls; the 31px detection border
masks out every wrapped pixel (all stencil radii are <= 15).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mono_slam_framework_tpu.ops import fast as fast_ops

PATCH_RADIUS = 15
HALO = 16
BLOCK = 64  # 96 rows/band puts the live set ~1 MB over the 16 MB VMEM budget
_SMALL_ROWS = BLOCK + 2 * HALO  # whole-image path below this


def _roll2(x, dy, dx):
    """Read neighbor at (+dy, +dx) for every pixel (circular).

    pltpu.roll requires non-negative shifts; negative shifts wrap by the
    (static) axis length.
    """
    h, w = x.shape
    if dy:
        x = pltpu.roll(x, (-dy) % h, 0)
    if dx:
        x = pltpu.roll(x, (-dx) % w, 1)
    return x


@functools.lru_cache(maxsize=None)
def _gauss7():
    x = np.arange(7) - 3.0
    k = np.exp(-(x * x) / (2.0 * 2.0 * 2.0))
    return tuple((k / k.sum()).astype(np.float32).tolist())


def _sep_filter(img, weights, radius):
    """Separable filter via rolls: rows then cols with the same weights."""
    rows = None
    for i, wgt in enumerate(weights):
        term = _roll2(img, i - radius, 0) * wgt
        rows = term if rows is None else rows + term
    out = None
    for i, wgt in enumerate(weights):
        term = _roll2(rows, 0, i - radius) * wgt
        out = term if out is None else out + term
    return out


def _any_arc9(mask):
    """Any 9-long contiguous circular run in a 16-plane ring mask, by arc
    doubling: run[s] of length 2k = run[s] of length k AND run[s+k] of
    length k. 4x16 ANDs + 15 ORs instead of the naive 16x8 AND scan —
    the segment test is pure dependent VPU work, so op count is time."""
    a2 = [mask[s] & mask[(s + 1) % 16] for s in range(16)]
    a4 = [a2[s] & a2[(s + 2) % 16] for s in range(16)]
    a8 = [a4[s] & a4[(s + 4) % 16] for s in range(16)]
    out = a8[0] & mask[8]
    for s in range(1, 16):
        out = out | (a8[s] & mask[(s + 8) % 16])
    return out


def _box_ramp31(x, axis, want_ramp=True):
    """31-tap centered box (and optionally ramp) filter along `axis` by
    doubling: A_2k(p) = A_k(p) + A_k(p+k) and
    M_2k(p) = M_k(p) + M_k(p+k) + k*A_k(p+k), where A_k / M_k are the
    length-k window sum / index-weighted sum starting at p. ~12 rolls
    instead of 31 (box) + 30 (ramp) taps. Returns (box, ramp):
      box[p]  = sum_{d=-15..15} x[p+d]
      ramp[p] = sum_{d=-15..15} d * x[p+d]   (None unless want_ramp)
    """

    def rl(a, d):
        return _roll2(a, d, 0) if axis == 0 else _roll2(a, 0, d)

    A, M = x, None  # A_1 = x; M_1 = 0 (elided)
    k = 1
    while k < 32:
        Ak = rl(A, k)
        if want_ramp:
            M = Ak * float(k) if M is None else M + rl(M, k) + Ak * float(k)
        A = A + Ak
        k *= 2
    # A_32/M_32 cover d=0..31; drop the d=31 term, then recenter to -15..15
    t = rl(x, 31)
    A = A - t
    box = rl(A, -15)
    if not want_ramp:
        return box, None
    M = M - t * 31.0
    ramp = rl(M, -15) - 15.0 * box
    return box, ramp


def _maps_body(img, threshold, y0, border, full_h, full_w=None):
    """All maps for a work window `img` whose first row is global row
    y0 (traced scalar). Returns (score, m10, m01, blur, harris) — the raw
    Harris surface is exported for subpixel peak interpolation.

    `full_w` is the real level width when the window is width-padded (the
    multi-level kernel pads every level to the level-0 width); the interior
    mask must use it BEFORE NMS, or garbage candidates over the pad can
    suppress real corners at the level's right edge."""
    h, w = img.shape
    if full_w is None:
        full_w = w

    # ---- FAST-9 segment test ----
    ring = [_roll2(img, dy, dx) for dy, dx in fast_ops.CIRCLE]
    bright = [r - img > threshold for r in ring]
    dark = [img - r > threshold for r in ring]
    is_corner = _any_arc9(bright) | _any_arc9(dark)

    # ---- Harris response ----
    def sob_x(a):
        gx = _roll2(a, 0, 1) - _roll2(a, 0, -1)
        return _roll2(gx, -1, 0) + 2.0 * gx + _roll2(gx, 1, 0)

    def sob_y(a):
        gy = _roll2(a, 1, 0) - _roll2(a, -1, 0)
        return _roll2(gy, 0, -1) + 2.0 * gy + _roll2(gy, 0, 1)

    ix = sob_x(img)
    iy = sob_y(img)

    def box7(a):
        # separable 7x7 mean by doubling (5 rolls/axis instead of 7 taps)
        for axis in (0, 1):
            rla = (lambda v, d: _roll2(v, d, 0)) if axis == 0 else (
                lambda v, d: _roll2(v, 0, d)
            )
            s2 = a + rla(a, 1)
            s4 = s2 + rla(s2, 2)
            a = rla(s4 + rla(s2, 4) + rla(a, 6), -3)
        return a * (1.0 / 49.0)

    sxx = box7(ix * ix)
    syy = box7(iy * iy)
    sxy = box7(ix * iy)
    harris = (sxx * syy - sxy * sxy) - 0.04 * (sxx + syy) * (sxx + syy)

    # ---- interior mask (global coords) + NMS ----
    yy = y0 + jax.lax.broadcasted_iota(jnp.int32, img.shape, 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, img.shape, 1)
    inside = (
        (yy >= border)
        & (yy < full_h - border)
        & (xx >= border)
        & (xx < full_w - border)
    )
    neg_inf = jnp.float32(-jnp.inf)
    cand = jnp.where(is_corner & inside, harris, neg_inf)
    mx = cand
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                mx = jnp.maximum(mx, _roll2(cand, dy, dx))
    score = jnp.where(cand >= mx, cand, neg_inf)

    # ---- orientation moments (square patch, radius 15) ----
    # m10 = ramp31_x(box31_y(img)), m01 = ramp31_y(box31_x(img)) — the
    # doubling filters cut the 2x61-tap scans to ~4x12 rolls
    colsum, _ = _box_ramp31(img, axis=0, want_ramp=False)
    _, m10 = _box_ramp31(colsum, axis=1)
    rowsum, _ = _box_ramp31(img, axis=1, want_ramp=False)
    _, m01 = _box_ramp31(rowsum, axis=0)

    # ---- 7x7 Gaussian blur ----
    blur = _sep_filter(img, list(_gauss7()), 3)
    return score, m10, m01, blur, harris


def _full_kernel(
    threshold, border, img_ref, score_ref, m10_ref, m01_ref, blur_ref, harris_ref
):
    score, m10, m01, blur, harris = _maps_body(
        img_ref[:], threshold, 0, border, img_ref.shape[0]
    )
    score_ref[:] = score
    m10_ref[:] = m10
    m01_ref[:] = m01
    blur_ref[:] = blur
    harris_ref[:] = harris


def _banded_kernel(
    threshold,
    border,
    real_h,
    img_ref,
    score_ref,
    m10_ref,
    m01_ref,
    blur_ref,
    harris_ref,
):
    # The input is pre-padded with HALO rows top and bottom, so every band's
    # work window starts at i*BLOCK in padded coords and the output band sits
    # at the STATIC offset HALO inside the window (no dynamic slices, which
    # Mosaic does not lower for values).
    i = pl.program_id(0)
    work = BLOCK + 2 * HALO
    start_padded = i * BLOCK
    window = img_ref[pl.ds(start_padded, work), :]
    y0_global = start_padded - HALO  # unpadded row of window row 0
    # border mask uses the REAL image height so pad rows are never corners
    score, m10, m01, blur, harris = _maps_body(
        window, threshold, y0_global, border, real_h
    )
    score_ref[:] = score[HALO : HALO + BLOCK, :]
    m10_ref[:] = m10[HALO : HALO + BLOCK, :]
    m01_ref[:] = m01[HALO : HALO + BLOCK, :]
    blur_ref[:] = blur[HALO : HALO + BLOCK, :]
    harris_ref[:] = harris[HALO : HALO + BLOCK, :]


@functools.partial(jax.jit, static_argnames=("threshold", "border", "interpret"))
def detect_stage(img, threshold: float = 20.0, border: int = 31, interpret: bool = False):
    """Run the fused detection stage. img [H,W] f32.

    Returns (score, m10, m01, blur, harris), all [H,W] f32.
    """
    img = img.astype(jnp.float32)
    h, w = img.shape
    if h <= _SMALL_ROWS:
        shape = jax.ShapeDtypeStruct((h, w), jnp.float32)
        kernel = functools.partial(_full_kernel, float(threshold), border)
        return pl.pallas_call(
            kernel,
            out_shape=(shape,) * 5,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)),
            interpret=interpret,
        )(img)

    n_bands = pl.cdiv(h, BLOCK)
    h_pad = n_bands * BLOCK
    # HALO rows top and bottom + band remainder padding (see _banded_kernel)
    img_in = jnp.pad(img, ((HALO, h_pad - h + HALO), (0, 0)))
    shape = jax.ShapeDtypeStruct((h_pad, w), jnp.float32)
    kernel = functools.partial(_banded_kernel, float(threshold), border, h)
    outs = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        out_shape=(shape,) * 5,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],  # full image each step
        out_specs=tuple(
            pl.BlockSpec((BLOCK, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(5)
        ),
        interpret=interpret,
    )(img_in)
    if h_pad != h:
        outs = tuple(o[:h] for o in outs)
        # rows clipped by padding may claim corners in the pad shadow; the
        # border mask already excludes them (border > pad in practice)
    return outs


# ---------------------------------------------------------------------------
# Whole-pyramid fused detection: every level's bands in ONE pallas launch.
#
# The per-level `detect_stage` is correct but latency-bound on TPU: 8
# sequential pallas launches (one per pyramid level) interleaved with XLA ops
# serialize, and the smaller levels' grids are too short to hide dispatch.
# Here all levels' row bands ride ONE grid: each level is width-padded to the
# level-0 width, its (BLOCK + 2*HALO)-row work windows are pre-gathered into
# a uniform [B, WORK, w0] band stack (so Pallas double-buffers the input
# blocks automatically), and per-band level geometry (y0, level h, level w)
# rides in SMEM tables. Per-band math is identical to `_banded_kernel`, so
# results are bit-identical to the per-level path (tests/test_pallas_detect).
# ---------------------------------------------------------------------------

_WORK = BLOCK + 2 * HALO


def _multi_kernel(
    threshold,
    border,
    y0_ref,
    h_ref,
    w_ref,
    img_ref,
    score_ref,
    m10_ref,
    m01_ref,
    blur_ref,
    harris_ref,
):
    i = pl.program_id(0)
    window = img_ref[0]
    score, m10, m01, blur, harris = _maps_body(
        window, threshold, y0_ref[i], border, h_ref[i], w_ref[i]
    )
    score_ref[:] = score[HALO : HALO + BLOCK, :]
    m10_ref[:] = m10[HALO : HALO + BLOCK, :]
    m01_ref[:] = m01[HALO : HALO + BLOCK, :]
    blur_ref[:] = blur[HALO : HALO + BLOCK, :]
    harris_ref[:] = harris[HALO : HALO + BLOCK, :]


@functools.lru_cache(maxsize=None)
def _band_layout(dims):
    """Static band tables for a tuple of per-level (h, w) dims.

    Returns (y0s, hs, ws, starts, nbands, w0, total_rows): per-band window
    row origin in level coords, per-band level height/width, per-level output
    row starts (level l occupies output rows [starts[l], starts[l] + h_l)),
    per-level band counts, the padded width, and the total output rows.
    """
    w0 = max(w for _, w in dims)
    y0s, hs, ws, starts, nbands = [], [], [], [], []
    row = 0
    for h, w in dims:
        nb = -(-h // BLOCK)
        starts.append(row)
        nbands.append(nb)
        for b in range(nb):
            y0s.append(b * BLOCK - HALO)
            hs.append(h)
            ws.append(w)
        row += nb * BLOCK
    return (
        np.asarray(y0s, np.int32),
        np.asarray(hs, np.int32),
        np.asarray(ws, np.int32),
        tuple(starts),
        tuple(nbands),
        w0,
        row,
    )


def detect_stage_multi_bands(img_bands, dims, threshold: float = 20.0,
                             border: int = 31, interpret: bool = False,
                             n_streams: int = 1):
    """Core of the whole-pyramid launch: img_bands [B, WORK, w0] is the
    pre-gathered per-band work-window stack for levels of sizes `dims`.

    With `n_streams` > 1, img_bands is N streams' band stacks concatenated
    ([N*B, WORK, w0], same layout per stream) and every output map comes
    back as [N*total_rows, w0] — stream s's level maps at rows
    [s*total_rows, (s+1)*total_rows). One grid serves all streams, so the
    per-launch dispatch cost amortizes across the batch (the multi-stream
    serving path, parallel/multistream.py)."""
    y0s, hs, ws, starts, nbands, w0, tot = _band_layout(tuple(dims))
    if n_streams > 1:
        y0s = np.tile(y0s, n_streams)
        hs = np.tile(hs, n_streams)
        ws = np.tile(ws, n_streams)
    shape = jax.ShapeDtypeStruct((n_streams * tot, w0), jnp.float32)
    kernel = functools.partial(_multi_kernel, float(threshold), border)
    outs = pl.pallas_call(
        kernel,
        grid=(img_bands.shape[0],),
        out_shape=(shape,) * 5,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, _WORK, w0), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec((BLOCK, w0), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(5)
        ),
        interpret=interpret,
    )(jnp.asarray(y0s), jnp.asarray(hs), jnp.asarray(ws), img_bands)
    return outs, starts


def detect_stage_multi(imgs, threshold: float = 20.0, border: int = 31,
                       interpret: bool = False):
    """Fused detection over ALL pyramid levels in one pallas launch.

    imgs: sequence of per-level [h_l, w_l] f32 images (w_l <= w_0).
    Returns ((score, m10, m01, blur, harris), starts): each map is
    [total_rows, w0] with level l's rows at [starts[l], starts[l] + h_l);
    cols >= w_l of a level are pad (score -inf there inside the border).
    """
    dims = tuple(tuple(im.shape) for im in imgs)
    _, _, _, _, nbands, w0, _ = _band_layout(dims)
    bands = []
    for im, nb in zip(imgs, nbands):
        h, w = im.shape
        pad = jnp.pad(
            im.astype(jnp.float32),
            ((HALO, nb * BLOCK - h + HALO), (0, w0 - w)),
        )
        idx = np.arange(nb)[:, None] * BLOCK + np.arange(_WORK)[None, :]
        bands.append(jnp.take(pad, jnp.asarray(idx), axis=0))
    return detect_stage_multi_bands(
        jnp.concatenate(bands), dims, threshold, border, interpret
    )
