"""Oriented-BRIEF (ORB) feature extraction as a fixed-shape XLA program.

Replaces cv::ORB::create()->detectAndCompute (reference matcher plugin,
src/featurematcher.cpp:4,15-17; OpenCV defaults: 500 features, 8 levels,
scale 1.2, Harris ranking, intensity-centroid orientation, rBRIEF).

TPU design notes:
  * per-level work is full-image convs/rolls (MXU/VPU) + one top_k;
  * orientation uses moment *maps* (two 31x31 convolutions over the whole
    level) instead of per-keypoint patch loops;
  * descriptors sample a pre-blurred image at 512 rotated pattern offsets per
    keypoint — one big gather, no per-keypoint control flow;
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


class Features(NamedTuple):
    """Fixed-capacity feature set for one image (a pytree leaf bundle)."""

    xy: jax.Array  # f32 [K, 2] level-0 pixel coords
    angle: jax.Array  # f32 [K] orientation (radians)
    desc: jax.Array  # uint32 [K, 8] packed 256-bit rBRIEF
    score: jax.Array  # f32 [K] Harris response
    valid: jax.Array  # bool [K]


@functools.lru_cache(maxsize=None)
def _brief_pattern_np(seed: int = 1234):
    """[256, 2, 2] (pair, point, yx) int offsets, Gaussian sigma patch/5."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, (2 * PATCH_RADIUS + 1) / 5.0, size=(N_BITS, 2, 2))
    pts = np.clip(np.round(pts), -13, 13)
    return pts.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _centroid_masks_np():
    """x- and y-weighted circular masks for the orientation moment convs."""
    r = PATCH_RADIUS
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    circle = (xs * xs + ys * ys) <= r * r
    mx = (xs * circle).astype(np.float32)
    my = (ys * circle).astype(np.float32)
    return mx, my


def _orientation_maps(img):
    """m10 and m01 moment maps via two 31x31 convolutions."""
    mx, my = _centroid_masks_np()
    # Convolution flips the kernel; we want correlation -> flip the masks.
    m10 = filters._conv2d_single(img, jnp.asarray(mx[::-1, ::-1].copy()))
    m01 = filters._conv2d_single(img, jnp.asarray(my[::-1, ::-1].copy()))
    return m10, m01


def _gather_pixels(img, xs, ys):
    """img[ys, xs] with clamping; xs/ys any integer shape."""
    h, w = img.shape
    xs = jnp.clip(xs, 0, w - 1)
    ys = jnp.clip(ys, 0, h - 1)
    return img.reshape(-1)[ys * w + xs]


def _describe(img_blur, xs, ys, angle):
    """rBRIEF descriptors. xs/ys i32 [K], angle f32 [K] -> uint32 [K, 8]."""
    pat = jnp.asarray(_brief_pattern_np())  # [256, 2, 2] (pair, pt, yx)
    c, s = jnp.cos(angle), jnp.sin(angle)  # [K]
    py = pat[None, :, :, 0]  # [1, 256, 2]
    px = pat[None, :, :, 1]
    # Rotate the pattern by the keypoint angle (steered BRIEF).
    rx = jnp.round(px * c[:, None, None] - py * s[:, None, None]).astype(jnp.int32)
    ry = jnp.round(px * s[:, None, None] + py * c[:, None, None]).astype(jnp.int32)
    sx = xs[:, None, None] + rx  # [K, 256, 2]
    sy = ys[:, None, None] + ry
    vals = _gather_pixels(img_blur, sx, sy)  # [K, 256, 2]
    bits = (vals[:, :, 0] < vals[:, :, 1]).astype(jnp.uint32)  # [K, 256]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(
        bits.reshape(-1, 8, 32) << shifts[None, None, :], axis=-1, dtype=jnp.uint32
    )
    return packed, bits


def _per_level_budget(total: int):
    """Geometric per-level feature budgets (OpenCV's distribution)."""
    q = 1.0 / SCALE_FACTOR
    raw = np.array([q**i for i in range(N_LEVELS)])
    raw = raw / raw.sum() * total
    budget = np.maximum(np.round(raw).astype(int), 1)
    budget[-1] = max(total - budget[:-1].sum(), 1)
    return [int(b) for b in budget]


def extract(img, max_features: int, fast_threshold: float = 20.0) -> Features:
    """ORB features over an 8-level pyramid. img: [H, W] f32 grayscale.

    Jit-friendly: static shapes throughout; returns exactly `max_features`
    slots with a validity mask.
    """
    budgets = _per_level_budget(max_features)
    h0, w0 = img.shape
    all_xy, all_angle, all_desc, all_score, all_valid = [], [], [], [], []
    level_img = img
    for lvl in range(N_LEVELS):
        scale = SCALE_FACTOR**lvl
        if lvl > 0:
            hl = int(round(h0 / scale))
            wl = int(round(w0 / scale))
            level_img = filters.resize_bilinear(img, (hl, wl))
        k_l = budgets[lvl]
        xs, ys, score, valid = fast.detect(
            level_img, k_l, threshold=fast_threshold, border=BORDER
        )
        m10, m01 = _orientation_maps(level_img)
        ang = jnp.arctan2(
            _gather_pixels(m01, xs, ys), _gather_pixels(m10, xs, ys)
        )
        blur = filters.gaussian_blur(level_img)
        desc, _ = _describe(blur, xs, ys, ang)
        xy0 = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], -1) * scale
        all_xy.append(xy0)
        all_angle.append(ang)
        all_desc.append(desc)
        all_score.append(jnp.where(valid, score, -jnp.inf))
        all_valid.append(valid)
    return Features(
        xy=jnp.concatenate(all_xy),
        angle=jnp.concatenate(all_angle),
        desc=jnp.concatenate(all_desc),
        score=jnp.concatenate(all_score),
        valid=jnp.concatenate(all_valid),
    )
