"""Pinhole projection / backprojection and batched frustum tests.

Replaces the per-point loops in Frame::isInFrustum (slam_pipeline/src/Frame.cc:48-84)
and the projection math scattered through LocalMapping::CreateNewMapPoints
(LocalMapping.cc:200-264) with one vectorized pass over all map points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def project(X_cam, K):
    """Project camera-frame 3D points to pixels. X_cam [..., 3], K [3,3]."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z = X_cam[..., 2]
    safe_z = jnp.where(z == 0, jnp.ones_like(z), z)
    u = fx * X_cam[..., 0] / safe_z + cx
    v = fy * X_cam[..., 1] / safe_z + cy
    return jnp.stack([u, v], axis=-1)


def transform_points(Tcw, X_world):
    """World -> camera frame. Tcw [...,4,4], X_world [...,3]."""
    R = Tcw[..., :3, :3]
    t = Tcw[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, X_world) + t[..., None, :]


def backproject(uv, K):
    """Pixels -> normalized camera rays (z=1). uv [...,2]."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "viewing_cos_limit")
)
def in_frustum(
    Tcw,
    K,
    X_world,
    normals,
    max_dist,
    width,
    height,
    viewing_cos_limit=0.5,
):
    """Vectorized Frame::isInFrustum (Frame.cc:48-84) over all map points.

    Jitted with static image bounds: callers pad X/normals/max_dist to a
    power-of-two capacity so per-frame candidate-count churn doesn't
    recompile (relay-attached TPU compiles cost minutes).

    Args:
      Tcw: [4,4] camera pose.
      K: [3,3] intrinsics.
      X_world: [N,3] map point positions.
      normals: [N,3] mean viewing directions (MapPoint::GetNormal).
      max_dist: [N] distance-invariance bound (1.2 * mfDistance,
        MapPoint.cc:222).
      width, height: image bounds (FrameBase.cc:10-13: min=0, max=cols/rows).
      viewing_cos_limit: reference passes 0.5 (Tracking.cc:612).

    Returns:
      bool [N] visibility mask.
    """
    Xc = transform_points(Tcw, X_world[None])[0]
    z_ok = Xc[..., 2] >= 0.0  # reference: PcZ < 0 -> reject (Frame.cc:59)
    uv = project(Xc, K)
    u, v = uv[..., 0], uv[..., 1]
    in_img = (u >= 0.0) & (u <= width) & (v >= 0.0) & (v <= height)
    Ow = -jnp.einsum("ji,j->i", Tcw[:3, :3], Tcw[:3, 3])
    PO = X_world - Ow
    dist = jnp.linalg.norm(PO, axis=-1)
    dist_ok = dist <= max_dist
    safe_dist = jnp.where(dist == 0, jnp.ones_like(dist), dist)
    view_cos = jnp.sum(PO * normals, axis=-1) / safe_dist
    cos_ok = view_cos >= viewing_cos_limit
    return z_ok & in_img & dist_ok & cos_ok
