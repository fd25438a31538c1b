"""FAST-9/16 corner detection + Harris ranking, fully vectorized.

TPU-native replacement for the detection stage of cv::ORB::detectAndCompute
(used by the reference matcher, src/featurematcher.cpp:15-17; OpenCV defaults:
FAST threshold 20, Harris scoring). The per-pixel segment test is expressed as
16 rolled copies of the image + a bitwise run-length test — pure VPU work with
no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mono_slam_framework_tpu.ops import filters

# Bresenham circle of radius 3: 16 (dy, dx) offsets in clockwise order.
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

ARC_LEN = 9  # FAST-9: at least 9 contiguous circle pixels


def _ring(img):
    """[16, ..., H, W] circle-neighbor intensities via static rolls."""
    return jnp.stack(
        [jnp.roll(img, (-dy, -dx), axis=(-2, -1)) for dy, dx in CIRCLE], axis=0
    )


def fast_score_map(img, threshold=20.0):
    """FAST-9 corner mask and score for every pixel.

    Args:
      img: [..., H, W] float grayscale (0..255); leading dims batch (e.g. the
        padded pyramid stack).
      threshold: intensity difference threshold (OpenCV fastThreshold=20).

    Returns:
      (is_corner bool [..., H, W], score f32 [..., H, W]) where score is the
      OpenCV-style FAST score: max over valid arcs of the min absolute
      difference along the arc. Borders (3 px) are never corners.
    """
    ring = _ring(img)
    diff = ring - img[None]
    bright = diff > threshold
    dark = diff < -threshold

    def arc_test(mask):
        # mask: [16,H,W]; any window of ARC_LEN consecutive (circular) Trues?
        ok = jnp.zeros_like(mask[0])
        for s in range(16):
            window = mask[(s + jnp.arange(ARC_LEN)) % 16]
            ok = ok | jnp.all(window, axis=0)
        return ok

    is_corner = arc_test(bright) | arc_test(dark)

    # Score: for each start, min |diff| over the arc; take max over arcs where
    # the arc passes; separate bright/dark.
    abs_diff = jnp.abs(diff)
    neg_inf = jnp.array(-jnp.inf, img.dtype)
    score = jnp.full(img.shape, -jnp.inf, img.dtype)
    for s in range(16):
        sel = (s + jnp.arange(ARC_LEN)) % 16
        win_b = jnp.all(bright[sel], axis=0)
        win_d = jnp.all(dark[sel], axis=0)
        arc_min = jnp.min(abs_diff[sel], axis=0)
        score = jnp.maximum(score, jnp.where(win_b | win_d, arc_min, neg_inf))
    score = jnp.where(is_corner, score, 0.0)

    # Mask the 3px border the rolls wrapped around.
    h, w = img.shape[-2], img.shape[-1]
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return is_corner & interior, score


def harris_response(img, block_size=7, k=0.04):
    """Harris corner response (cv::ORB ranks FAST corners by Harris).

    Derivatives and the three window sums run as grouped multi-channel
    depthwise convs so the whole response is a handful of well-vectorized
    conv kernels instead of nine single-channel passes.
    """
    d = jnp.asarray([-1.0, 0.0, 1.0], img.dtype)
    s = jnp.asarray([1.0, 2.0, 1.0], img.dtype)
    two = jnp.stack([img, img])
    grads = filters.depthwise_sep_conv(
        two, jnp.stack([d, s]), jnp.stack([s, d])
    )  # [2,H,W]: ix, iy
    ix, iy = grads[0], grads[1]
    prods = jnp.stack([ix * ix, iy * iy, ix * iy])
    box = jnp.full((block_size,), 1.0 / block_size, img.dtype)
    boxes = jnp.stack([box, box, box])
    sums = filters.depthwise_sep_conv(prods, boxes, boxes)  # [3,H,W]
    sxx, syy, sxy = sums[0], sums[1], sums[2]
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def detect(img, max_corners, threshold=20.0, border=31):
    """Top-`max_corners` FAST corners ranked by Harris with 3x3 NMS.

    Returns (xs i32 [K], ys i32 [K], response f32 [K], valid bool [K]).
    Static output shape; invalid slots padded.
    """
    is_corner, _ = fast_score_map(img, threshold)
    harris = harris_response(img)
    h, w = img.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inside = (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)
    cand = jnp.where(is_corner & inside, harris, -jnp.inf)
    # 3x3 non-max suppression on the candidate response.
    nms = cand >= filters.max_pool_3x3_same(cand)
    score = jnp.where(nms, cand, -jnp.inf)
    # approx_max_k is the TPU-native selection primitive — a full top_k sorts
    # all H*W scores (hundreds of ms per level); approximate selection of
    # corner responses is exactly the use-case it exists for.
    vals, idx = jax.lax.approx_max_k(
        score.reshape(-1), max_corners, recall_target=0.95
    )
    ys = idx // w
    xs = idx - ys * w
    valid = jnp.isfinite(vals)
    return xs.astype(jnp.int32), ys.astype(jnp.int32), vals, valid
