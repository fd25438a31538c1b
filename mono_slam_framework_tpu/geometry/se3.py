"""SE(3) utilities: exp/log maps, inverses, quaternion conversions.

Replaces the reference's Converter (slam_pipeline/src/Converter.cc) and the
pose bookkeeping in FrameBase::SetPose (slam_pipeline/src/FrameBase.cc:53-63).
All functions are pure jnp, batch-friendly (leading dims broadcast via vmap),
and dtype-polymorphic so the same code runs f32 on TPU and f64 in CPU parity
tests.

Convention: ``T`` is a 4x4 world->camera transform (the reference's ``mTcw``);
tangent vectors are ``[omega, upsilon]`` (rotation first), matching g2o's
SE3Quat::exp ordering used by VertexSE3Expmap updates.
"""

from __future__ import annotations

import jax.numpy as jnp


def hat(w):
    """Skew-symmetric matrix of a 3-vector."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def _sinc_coeffs(theta2):
    """Taylor-safe (A, B, C) = (sin t/t, (1-cos t)/t^2, (1 - A)/t^2).

    The Taylor branch covers theta < 0.05 (not just ~1e-4): in f32 the
    closed forms cancel catastrophically well before that — e.g.
    1-cos(1.3e-4) evaluates to exactly 0.0 in f32 (spacing at 1.0 is
    1.2e-7), which once produced B=0 -> A/(2B)=inf -> NaN translations in
    log_se3 on a real loop graph. Second-order Taylor keeps |error| below
    ~1e-9 at the 0.05 boundary, better than the f32 closed form there."""
    theta = jnp.sqrt(theta2)
    small = theta2 < 2.5e-3  # theta < 0.05
    # Guard theta for the large branch to avoid nan grads at 0.
    th = jnp.where(small, jnp.ones_like(theta), theta)
    t2 = theta2
    A = jnp.where(small, 1.0 - t2 / 6.0 + t2 * t2 / 120.0, jnp.sin(th) / th)
    B = jnp.where(
        small, 0.5 - t2 / 24.0 + t2 * t2 / 720.0, (1.0 - jnp.cos(th)) / t2
    )
    C = jnp.where(
        small, 1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0, (1.0 - A) / t2
    )
    return A, B, C


def exp_so3(w):
    """Rodrigues: 3-vector -> 3x3 rotation."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    W = hat(w)
    I = jnp.eye(3, dtype=w.dtype)
    return I + A[..., None, None] * W + B[..., None, None] * (W @ W)


def orthonormalize(T):
    """Project the rotation block of a 4x4 (or [...,4,4]) transform onto SO(3).

    g2o's VertexSE3Expmap stores an SE3Quat (unit quaternion + translation),
    so every upstream optimization implicitly returns an exactly-orthonormal
    rotation (Optimizer.cc:217-334 via SE3Quat::to_homogeneous_matrix). Raw
    4x4 storage must do this explicitly: float32 accumulation through the
    motion-model composition loop (Tracking.cc:155-165 twin) otherwise
    AMPLIFIES off-manifold error ~2.4x per frame — the rotation block decays
    toward zero within ~20 frames, collapsing tracked scale (diagnosed
    round 2; see KNOWN_ISSUES.md).

    Two Newton steps of the polar decomposition (R <- 1.5 R - 0.5 R R^T R),
    quadratically convergent for near-orthonormal R: e=1e-3 -> ~1e-12.
    Branch-free and jit/vmap-friendly.
    """
    R = T[..., :3, :3]
    for _ in range(2):
        R = 1.5 * R - 0.5 * R @ jnp.swapaxes(R, -1, -2) @ R
    return T.at[..., :3, :3].set(R)


def log_so3(R):
    """3x3 rotation -> 3-vector (angle-axis).

    atan2 form (sin from the antisymmetric part, cos from the trace): more
    accurate than arccos for small angles in f32 AND autodiff-safe — the
    arccos form has an infinite derivative at the identity, which poisons
    jacfwd-based optimizers (optim/pose_graph.py) with NaNs on zero-residual
    edges. The small-angle branch is double-where-guarded so the sqrt never
    sees 0 under differentiation."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    s2 = 0.25 * jnp.sum(vee * vee, axis=-1)  # sin^2(theta)
    small = s2 < 1e-12
    s2_safe = jnp.where(small, jnp.ones_like(s2), s2)
    sin_t = jnp.sqrt(s2_safe)
    theta = jnp.arctan2(sin_t, cos_t)
    scale = jnp.where(small, 0.5 + s2 / 12.0, theta / (2.0 * sin_t))
    return scale[..., None] * vee


def exp_se3(xi):
    """Tangent [omega(3), upsilon(3)] -> 4x4 transform (g2o ordering)."""
    w = xi[..., :3]
    v = xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, C = _sinc_coeffs(theta2)
    W = hat(w)
    I = jnp.eye(3, dtype=xi.dtype)
    R = I + A[..., None, None] * W + B[..., None, None] * (W @ W)
    V = I + B[..., None, None] * W + C[..., None, None] * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, v)
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def log_se3(T):
    """4x4 transform -> tangent [omega, upsilon]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    W = hat(w)
    I = jnp.eye(3, dtype=T.dtype)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2. The closed form is a
    # difference of nearly-equal terms (A/(2B) = 1 - theta^2/12 + ...), so
    # in f32 it loses ALL significant digits below theta ~ 0.05 — Taylor
    # there (see _sinc_coeffs' f32 rationale).
    small = theta2 < 2.5e-3
    t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    Bs = jnp.where(small, jnp.ones_like(B), B)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0,
        (1.0 - A / (2.0 * Bs)) / t2,
    )
    Vinv = I - 0.5 * W + coef[..., None, None] * (W @ W)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def compose(Ta, Tb):
    return Ta @ Tb


def inverse(T):
    """Fast SE3 inverse (FrameBase.cc:53-63 computes the same Twc from Tcw)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt)
    Ti = Ti.at[..., :3, 3].set(ti)
    Ti = Ti.at[..., 3, 3].set(1.0)
    return Ti


def camera_center(Tcw):
    """World coordinates of the camera center Ow = -Rcw^T tcw."""
    R = Tcw[..., :3, :3]
    t = Tcw[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)


def rotation_to_quaternion(R):
    """3x3 rotation -> quaternion [qx, qy, qz, qw] (TUM export order).

    Matches Converter::toQuaternion (Converter.cc:113-124), which returns
    Eigen xyzw for SaveKeyFrameTrajectoryTUM (System.cc:115-117). Shepperd's
    branch-free-ish method, safe for all quadrants.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def mk(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    # Four candidate constructions; pick the numerically best.
    q0 = mk(m21 - m12, m02 - m20, m10 - m01, 1.0 + tr)  # w-major
    q1 = mk(1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12)  # x-major
    q2 = mk(m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20)  # y-major
    q3 = mk(m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01)  # z-major
    s0 = 1.0 + tr
    s1 = 1.0 + m00 - m11 - m22
    s2 = 1.0 - m00 + m11 - m22
    s3 = 1.0 - m00 - m11 + m22
    s = jnp.stack([s0, s1, s2, s3], axis=-1)
    idx = jnp.argmax(s, axis=-1)[..., None]
    q = jnp.where(
        idx == 0, q0, jnp.where(idx == 1, q1, jnp.where(idx == 2, q2, q3))
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize sign: qw >= 0.
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return q


def quaternion_to_rotation(q):
    """Quaternion [qx, qy, qz, qw] -> 3x3 rotation."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def make_T(R, t):
    T = jnp.zeros(R.shape[:-2] + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T
