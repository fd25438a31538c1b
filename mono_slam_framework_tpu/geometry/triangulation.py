"""Batched DLT triangulation.

Replaces Initializer::Triangulate (slam_pipeline/src/Initializer.cc:744-758)
and the inline 4x4-SVD triangulation in LocalMapping::CreateNewMapPoints
(LocalMapping.cc:211-227). One call triangulates every correspondence at once
(the TPU-parallel surface the reference's serial loops leave on the table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_dlt(uv1, uv2, P1, P2):
    """Linear triangulation of pixel correspondences.

    Args:
      uv1, uv2: [N, 2] pixel (or normalized) coordinates in image 1/2.
      P1, P2: [3, 4] projection matrices for the matching coordinate space.

    Returns:
      X: [N, 3] euclidean points, w: [N] homogeneous scale (w==0 means the
      solve degenerated; the caller must mask, mirroring LocalMapping.cc:224).
    """
    # A rows: u*P[2] - P[0], v*P[2] - P[1] for each view.
    a0 = uv1[:, 0:1] * P1[2] - P1[0]
    a1 = uv1[:, 1:2] * P1[2] - P1[1]
    a2 = uv2[:, 0:1] * P2[2] - P2[0]
    a3 = uv2[:, 1:2] * P2[2] - P2[1]
    A = jnp.stack([a0, a1, a2, a3], axis=1)  # [N, 4, 4]
    # Null vector of A = last right-singular vector. Batched 4x4 SVD is cheap
    # and XLA lowers it well for tiny fixed shapes.
    _, _, vt = jnp.linalg.svd(A)
    Xh = vt[:, 3, :]  # [N, 4]
    w = Xh[:, 3]
    safe_w = jnp.where(w == 0, jnp.ones_like(w), w)
    X = Xh[:, :3] / safe_w[:, None]
    return X, w


@jax.jit
def triangulate_gated(uv1, uv2, valid, K1, K2, Tcw1, Tcw2, min_parallax):
    """Full CreateNewMapPoints device stage as ONE jitted program
    (LocalMapping.cc:199-264): parallax gate on backprojected rays,
    normalized-coordinate DLT, cheirality and chi2 reprojection gates.

    All inputs are fixed-capacity (callers pad to a power of two and mask
    with `valid`): per-frame shape churn would recompile on every call,
    which through a TPU relay costs minutes — the round-2 end-to-end
    profiling showed the previous eager op-by-op version dominating the
    full-pipeline frame time.

    Returns (X [N,3] world points, ok bool [N]).
    """
    R1 = Tcw1[:3, :3]
    t1 = Tcw1[:3, 3]
    R2 = Tcw2[:3, :3]
    t2 = Tcw2[:3, 3]
    cosp = rays_cos_parallax(uv1, uv2, K1, K2, R1.T, R2.T)
    gate = (cosp > 0) & (cosp < min_parallax)

    fx1, fy1, cx1, cy1 = K1[0, 0], K1[1, 1], K1[0, 2], K1[1, 2]
    fx2, fy2, cx2, cy2 = K2[0, 0], K2[1, 1], K2[0, 2], K2[1, 2]
    xn1 = jnp.stack([(uv1[:, 0] - cx1) / fx1, (uv1[:, 1] - cy1) / fy1], -1)
    xn2 = jnp.stack([(uv2[:, 0] - cx2) / fx2, (uv2[:, 1] - cy2) / fy2], -1)
    P1 = jnp.concatenate([R1, t1[:, None]], axis=1)
    P2 = jnp.concatenate([R2, t2[:, None]], axis=1)
    X, w_h = triangulate_dlt(xn1, xn2, P1, P2)

    z1 = X @ R1[2] + t1[2]
    z2 = X @ R2[2] + t2[2]
    x1p = X @ R1[0] + t1[0]
    y1p = X @ R1[1] + t1[1]
    x2p = X @ R2[0] + t2[0]
    y2p = X @ R2[1] + t2[1]
    zs1 = jnp.where(z1 == 0, 1.0, z1)
    zs2 = jnp.where(z2 == 0, 1.0, z2)
    e1 = (fx1 * x1p / zs1 + cx1 - uv1[:, 0]) ** 2 + (
        fy1 * y1p / zs1 + cy1 - uv1[:, 1]
    ) ** 2
    e2 = (fx2 * x2p / zs2 + cx2 - uv2[:, 0]) ** 2 + (
        fy2 * y2p / zs2 + cy2 - uv2[:, 1]
    ) ** 2
    ok = (
        valid
        & gate
        & (w_h != 0)
        & (z1 > 0)
        & (z2 > 0)
        & (e1 <= 5.991)
        & (e2 <= 5.991)
        & jnp.isfinite(X).all(axis=1)
    )
    return X, ok


def rays_cos_parallax(uv1, uv2, K1, K2, Rwc1, Rwc2):
    """cos of the angle between the backprojected world rays of each match.

    Mirrors the parallax gate in LocalMapping.cc:199-211.
    """
    fx1, fy1, cx1, cy1 = K1[0, 0], K1[1, 1], K1[0, 2], K1[1, 2]
    fx2, fy2, cx2, cy2 = K2[0, 0], K2[1, 1], K2[0, 2], K2[1, 2]
    xn1 = jnp.stack(
        [(uv1[:, 0] - cx1) / fx1, (uv1[:, 1] - cy1) / fy1, jnp.ones_like(uv1[:, 0])],
        axis=-1,
    )
    xn2 = jnp.stack(
        [(uv2[:, 0] - cx2) / fx2, (uv2[:, 1] - cy2) / fy2, jnp.ones_like(uv2[:, 0])],
        axis=-1,
    )
    ray1 = xn1 @ Rwc1.T
    ray2 = xn2 @ Rwc2.T
    denom = jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1)
    denom = jnp.where(denom == 0, jnp.ones_like(denom), denom)
    return jnp.sum(ray1 * ray2, axis=-1) / denom


# batched form over B keyframe pairs (one device call for the whole
# CreateNewMapPoints neighbor sweep — each pair was a separate dispatch +
# readback before, ~2 relay round trips x 20 neighbors per keyframe event)
triangulate_gated_many = jax.jit(
    jax.vmap(triangulate_gated, in_axes=(0, 0, 0, None, 0, None, 0, None))
)
