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
    is_corner = jnp.zeros(img.shape, jnp.bool_)
    for s in range(16):
        wb = bright[s % 16]
        wd = dark[s % 16]
        for k in range(1, fast_ops.ARC_LEN):
            wb = wb & bright[(s + k) % 16]
            wd = wd & dark[(s + k) % 16]
        is_corner = is_corner | wb | wd

    # ---- Harris response ----
    def sob_x(a):
        gx = _roll2(a, 0, 1) - _roll2(a, 0, -1)
        return _roll2(gx, -1, 0) + 2.0 * gx + _roll2(gx, 1, 0)

    def sob_y(a):
        gy = _roll2(a, 1, 0) - _roll2(a, -1, 0)
        return _roll2(gy, 0, -1) + 2.0 * gy + _roll2(gy, 0, 1)

    ix = sob_x(img)
    iy = sob_y(img)
    box = [1.0 / 7.0] * 7
    sxx = _sep_filter(ix * ix, box, 3)
    syy = _sep_filter(iy * iy, box, 3)
    sxy = _sep_filter(ix * iy, box, 3)
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
    r = PATCH_RADIUS
    colsum = None
    for dy in range(-r, r + 1):
        t = _roll2(img, dy, 0)
        colsum = t if colsum is None else colsum + t
    m10 = None
    for dx in range(-r, r + 1):
        if dx == 0:
            continue
        t = _roll2(colsum, 0, dx) * float(dx)
        m10 = t if m10 is None else m10 + t
    rowsum = None
    for dx in range(-r, r + 1):
        t = _roll2(img, 0, dx)
        rowsum = t if rowsum is None else rowsum + t
    m01 = None
    for dy in range(-r, r + 1):
        if dy == 0:
            continue
        t = _roll2(rowsum, dy, 0) * float(dy)
        m01 = t if m01 is None else m01 + t

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
