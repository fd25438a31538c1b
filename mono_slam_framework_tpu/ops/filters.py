"""Separable image filters and resizing used by the ORB front-end.

These are full-image ops, deliberately expressed as XLA convolutions so they
tile onto the TPU's MXU/VPU (the reference's OpenCV equivalents run serial CPU
loops inside cv::ORB::detectAndCompute, src/featurematcher.cpp:15-17).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _conv2d_single(img, kernel):
    """SAME 2D convolution with [kh,kw] (zero padding). img: [H,W] or [B,H,W]."""
    batched = img.ndim == 3
    x = img[:, None] if batched else img[None, None]
    out = jax.lax.conv_general_dilated(
        x,
        kernel[None, None].astype(img.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[:, 0] if batched else out[0, 0]


def sep_conv2d(img, kx, ky):
    """Separable SAME convolution: rows with ky, cols with kx."""
    out = _conv2d_single(img, jnp.asarray(ky)[:, None])
    return _conv2d_single(out, jnp.asarray(kx)[None, :])


def depthwise_sep_conv(x, kxs, kys):
    """Per-channel separable SAME convolution.

    x: [C, H, W]; kxs/kys: [C, k] per-channel 1-D kernels. One grouped conv
    per axis — C channels ride the conv batch together instead of C separate
    single-channel programs (much better VPU utilization on TPU).
    """
    c = x.shape[0]
    kys = jnp.asarray(kys).astype(x.dtype)
    kxs = jnp.asarray(kxs).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x[None],
        kys[:, None, :, None],  # [C,1,k,1]
        window_strides=(1, 1),
        padding="SAME",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = jax.lax.conv_general_dilated(
        out,
        kxs[:, None, None, :],  # [C,1,1,k]
        window_strides=(1, 1),
        padding="SAME",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0]


@functools.lru_cache(maxsize=None)
def _gaussian_kernel_np(size: int, sigma: float):
    x = np.arange(size) - (size - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img, size=7, sigma=2.0):
    """Gaussian blur (OpenCV ORB blurs with 7x7 sigma 2 before rBRIEF)."""
    k = jnp.asarray(_gaussian_kernel_np(size, sigma))
    return sep_conv2d(img, k, k)


def box_blur(img, size):
    k = jnp.full((size,), 1.0 / size, img.dtype)
    return sep_conv2d(img, k, k)


def resize_bilinear(img, new_hw):
    return jax.image.resize(img, new_hw, method="bilinear")


def max_pool_3x3_same(x):
    """3x3 max filter with SAME padding over the last two dims (for NMS)."""
    lead = (1,) * (x.ndim - 2)
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=lead + (3, 3),
        window_strides=(1,) * x.ndim,
        padding="SAME",
    )
