"""The full 4x10 pose-LM schedule as ONE Pallas kernel.

The XLA implementation of PoseOptimization (optim/pose_opt.py) is
sequential-latency-bound on TPU: 48 tiny edge evaluations + 40 6x6 solves
dispatch as hundreds of micro-kernels (~1.5 ms per call at 512 edges even
fully unrolled, and the steady tracking program runs TWO of them). Here the
whole schedule — 4 reference rounds x 10 LM iterations, Huber IRLS,
Nielsen damping, inter-round chi2 reclassification (Optimizer.cc:217-334
policies, see optim/lm.py) — runs inside one kernel: edge math is [.., E]
vector work in VMEM, H/b assembly is an (8, 2E) x (2E, 8) MXU contraction,
and the 6x6 solve is a mask-based Gauss-Jordan on an (8, 8) tile (no
pivoting needed: H + lambda*I is SPD).

Numerics match the XLA path to f32 reassociation noise; parity is pinned by
tests/test_optim.py (kernel-vs-XLA in interpret mode and the shared f64
oracle tolerance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mono_slam_framework_tpu.optim import lm

N_ROUNDS = 4
N_ITERS = 10

# tiny constants, built INSIDE the kernel trace from iota (Pallas kernels
# cannot capture closure array constants) --------------------------------


def _oh_col(j, n=8):
    return (
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == j
    ).astype(jnp.float32)


def _oh_row(j, n=8):
    return (
        jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) == j
    ).astype(jnp.float32)


def _eye(n):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(jnp.float32)


def _basis(i, j, n=4):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ((r == i) & (c == j)).astype(jnp.float32)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _edge_terms(T, xh, uv, mask, info, fx, fy, cx, cy, use_huber):
    """Vectorized edge residuals/weights/Jacobian rows at pose T.

    Returns (r0, r1 [1,E], e2 [1,E], w [1,E], Ju, Jv [8,E], chi scalar).
    Math mirrors optim/pose_opt.py::_edge_terms + lm.projection_jacobians /
    lm.se3_point_jacobian composed numerically. Row extraction goes through
    one-hot contractions (NOT value slices): Mosaic tracks sublane offsets
    on sliced vectors and refuses to concatenate mixed-offset operands.
    """
    Xc = _dot(T, xh)  # [4, E]; row 3 stays 1
    x = _dot(_oh_row(0, 4), Xc)  # [1, E], offset-clean
    y = _dot(_oh_row(1, 4), Xc)
    z = _dot(_oh_row(2, 4), Xc)
    uv0 = _dot(_oh_row(0, 2), uv)
    uv1 = _dot(_oh_row(1, 2), uv)
    zs = jnp.where(z == 0.0, 1.0, z)
    iz = 1.0 / zs
    iz2 = iz * iz
    r0 = fx * x * iz + cx - uv0
    r1 = fy * y * iz + cy - uv1
    e2 = (r0 * r0 + r1 * r1) * info  # [1, E]

    if use_huber:
        delta = jnp.float32(np.sqrt(lm.HUBER_DELTA2))
        safe = jnp.maximum(e2, 1e-12)
        w = jnp.where(e2 <= lm.HUBER_DELTA2, 1.0, delta / jnp.sqrt(safe))
        rho = jnp.where(
            e2 <= lm.HUBER_DELTA2,
            e2,
            2.0 * delta * jnp.sqrt(safe) - lm.HUBER_DELTA2,
        )
    else:
        w = jnp.ones_like(e2)
        rho = e2
    w = w * info * mask
    chi = jnp.sum(rho * mask)

    # J = Jp @ Jx with Jp = [[fx iz, 0, -fx x iz2], [0, fy iz, -fy y iz2]]
    # and Jx rows [0, z, -y, 1, 0, 0] / [-z, 0, x, 0, 1, 0] / [y, -x, 0, 0, 0, 1]
    a0 = fx * iz
    a2 = -fx * x * iz2
    b1 = fy * iz
    b2 = -fy * y * iz2
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    ju = [
        a2 * y,
        a0 * z + a2 * (-x),
        a0 * (-y),
        a0 * one,
        zero,
        a2,
    ]
    jv = [
        b1 * (-z) + b2 * y,
        b2 * (-x),
        b1 * x,
        zero,
        b1 * one,
        b2,
    ]
    pad = [zero, zero]
    Ju = jnp.concatenate(ju + pad, axis=0)  # [8, E]
    Jv = jnp.concatenate(jv + pad, axis=0)
    return r0, r1, e2, w, Ju, Jv, chi


def _assemble(r0, r1, w, Ju, Jv):
    """H = J^T diag(w) J and b = J^T diag(w) r over both residual rows."""

    def gram(Jm):
        return jax.lax.dot_general(
            Jm * w, Jm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    H8 = gram(Ju) + gram(Jv)  # [8, 8]
    # [8,E]x[1,E] contractions lower to non-constant-accumulator
    # multi_reductions that Mosaic rejects; a plain lane reduction works
    b8 = jnp.sum(
        Ju * (w * r0) + Jv * (w * r1), axis=1, keepdims=True
    )  # [8, 1]
    return H8, b8


def _solve8(A, b):
    """Gauss-Jordan on the 6x6 block of an (8,8) system (no pivoting; A is
    H + lambda*I, SPD). Pure mask/broadcast ops — no value indexing."""
    for j in range(6):
        ec = _oh_col(j)  # [8, 1]
        er = _oh_row(j)  # [1, 8]
        pj = jnp.sum(A * _basis(j, j, 8))
        inv = 1.0 / pj
        rowj = jnp.sum(A * ec, axis=0, keepdims=True) * inv  # [1, 8]
        bj = jnp.sum(b * ec) * inv
        colj = jnp.sum(A * er, axis=1, keepdims=True)  # [8, 1]
        colj = colj * (1.0 - ec)  # exclude the pivot row
        A = A - colj * rowj
        b = b - colj * bj
        A = A * (1.0 - ec) + ec * rowj
        b = b * (1.0 - ec) + ec * bj
    return b  # rows 0..5 = solution; rows 6,7 untouched zeros


def _sinc_coeffs_scalar(theta2):
    theta = jnp.sqrt(theta2)
    small = theta2 < 1e-8
    th = jnp.where(small, 1.0, theta)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(th)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2)
    return A, B, C


def _exp_se3_4x4(delta8):
    """exp([omega, upsilon]) as a 4x4, from an (8,1) tangent column."""
    s = [jnp.sum(delta8 * _oh_col(k)) for k in range(6)]
    wx, wy, wz, vx, vy, vz = s
    theta2 = wx * wx + wy * wy + wz * wz
    A, B, C = _sinc_coeffs_scalar(theta2)
    # so(3) generators embedded in 4x4
    W = (
        wx * (_basis(2, 1) - _basis(1, 2))
        + wy * (_basis(0, 2) - _basis(2, 0))
        + wz * (_basis(1, 0) - _basis(0, 1))
    )
    W2 = _dot(W, W)
    I3 = _eye(4) - _basis(3, 3)
    R = I3 + A * W + B * W2
    V = I3 + B * W + C * W2
    ups = vx * _oh_col(0, 4) + vy * _oh_col(1, 4) + vz * _oh_col(2, 4)
    t = _dot(V, ups)  # [4, 1]
    return R + t * _oh_row(3, 4) + _basis(3, 3)


def _lm_kernel(
    n_rounds,
    n_iters,
    k_ref,
    xh_ref,
    uv_ref,
    valid_ref,
    info_ref,
    tinit_ref,
    tout_ref,
    inlier_ref,
):
    fx = k_ref[0, 0]
    fy = k_ref[0, 1]
    cx = k_ref[0, 2]
    cy = k_ref[0, 3]
    xh = xh_ref[:]
    uv = uv_ref[:]
    valid = valid_ref[:]
    info = info_ref[:]
    T_init = tinit_ref[:]

    def run_round(mask, use_huber):
        r0, r1, e2, w, Ju, Jv, chi0 = _edge_terms(
            T_init, xh, uv, mask, info, fx, fy, cx, cy, use_huber
        )
        H0, b0 = _assemble(r0, r1, w, Ju, Jv)
        lam0 = lm.TAU * jnp.max(H0 * _eye(8))

        def step(_, carry):
            T, lam, nu, chi, H8, b8, e2c = carry
            Adamp = H8 + lam * _eye(8)
            xsol = _solve8(Adamp, b8)  # delta = -xsol
            T_new = _dot(_exp_se3_4x4(-xsol), T)
            r0n, r1n, e2_n, w_n, Jun, Jvn, chi_new = _edge_terms(
                T_new, xh, uv, mask, info, fx, fy, cx, cy, use_huber
            )
            H_n, b_n = _assemble(r0n, r1n, w_n, Jun, Jvn)
            # gain ratio: delta^T (lam*delta - b) with delta = -xsol
            denom = jnp.maximum(jnp.sum(-xsol * (lam * (-xsol) - b8)), 1e-12)
            rho = (chi - chi_new) / denom
            accept = jnp.isfinite(chi_new) & (chi_new < chi)
            shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            lam_n = jnp.where(accept, lam * shrink, lam * nu)
            nu_n = jnp.where(accept, 2.0, nu * 2.0)
            keep = lambda new, old: jnp.where(accept, new, old)
            return (
                keep(T_new, T),
                lam_n,
                nu_n,
                keep(chi_new, chi),
                keep(H_n, H8),
                keep(b_n, b8),
                keep(e2_n, e2c),
            )

        carry = (T_init, lam0, jnp.float32(2.0), chi0, H0, b0, e2)
        T_fin, _, _, _, _, _, e2_fin = jax.lax.fori_loop(
            0, n_iters, step, carry
        )
        return T_fin, e2_fin

    mask = valid
    T_fin = T_init
    inl = valid
    for rnd in range(n_rounds):
        T_fin, e2_fin = run_round(mask, use_huber=rnd < 3)
        # reclassify ALL edges by raw chi2 at the new pose; e2 is
        # mask-independent so the carried values serve directly
        inl = jnp.where(e2_fin <= lm.CHI2_MONO, 1.0, 0.0)
        mask = valid * inl

    tout_ref[:] = T_fin
    inlier_ref[:] = inl


@functools.partial(
    jax.jit, static_argnames=("n_rounds", "n_iters", "interpret")
)
def pose_optimize_pallas(
    T_init,
    Xw,
    uv,
    valid,
    K,
    info=None,
    n_rounds: int = N_ROUNDS,
    n_iters: int = N_ITERS,
    interpret: bool = False,
):
    """Kernel-backed twin of optim.pose_opt.pose_optimize (f32, TPU).

    Same returns: (T_opt [4,4] orthonormalized, inlier bool [E], n_good).
    """
    E = Xw.shape[0]
    f32 = jnp.float32
    Xw = Xw.astype(f32)
    xh = jnp.concatenate([Xw.T, jnp.ones((1, E), f32)], axis=0)  # [4, E]
    uvT = uv.astype(f32).T  # [2, E]
    maskf = valid.astype(f32)[None]  # [1, E]
    infof = (
        jnp.ones((1, E), f32) if info is None else info.astype(f32)[None]
    )
    kvec = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]).astype(
        f32
    ).reshape(1, 4)
    kernel = functools.partial(_lm_kernel, n_rounds, n_iters)
    T_fin, inl = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((4, 4), f32),
            jax.ShapeDtypeStruct((1, E), f32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(kvec, xh, uvT, maskf, infof, T_init.astype(f32))
    from mono_slam_framework_tpu.geometry import se3

    inlier = (inl[0] > 0.5) & valid
    n_good = jnp.sum(inlier.astype(jnp.int32))
    return se3.orthonormalize(T_fin), inlier, n_good
