"""Batched DLT triangulation.

Replaces Initializer::Triangulate (slam_pipeline/src/Initializer.cc:744-758)
and the inline 4x4-SVD triangulation in LocalMapping::CreateNewMapPoints
(LocalMapping.cc:211-227). One call triangulates every correspondence at once
(the TPU-parallel surface the reference's serial loops leave on the table).
"""

from __future__ import annotations

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
