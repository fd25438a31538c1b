"""Motion-only pose optimization (the reference's PoseOptimization).

Capability twin of Optimizer::PoseOptimization (slam_pipeline/src/Optimizer.cc:
217-334): one SE3 vertex, unary projection edges, 4 rounds x 10 LM iterations
with chi2 = 5.991 outlier reclassification between rounds, Huber kernel
dropped after round 3 (it == 2 check at Optimizer.cc:320), and — a reference
behavior preserved deliberately — every round RESTARTS from the input pose
(vSE3->setEstimate(pFrame->mTcw) at Optimizer.cc:295; mTcw is only written
after all rounds).

TPU design: the whole 4x10 schedule is ONE jitted program over fixed-shape
padded edge arrays — `lax.scan` over rounds, inner `lax.scan` over LM
iterations, masks for the evolving inlier set. The 6x6 normal-equation solve
is trivially dense.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mono_slam_framework_tpu.geometry import se3
from mono_slam_framework_tpu.optim import lm

N_ROUNDS = 4
N_ITERS = 10

# None = auto (Pallas kernel on TPU backends, XLA elsewhere); tests may pin.
USE_PALLAS: bool | None = None


def _use_pallas(dtype) -> bool:
    if dtype != jnp.float32:
        return False  # the f64 oracle path stays XLA
    if USE_PALLAS is not None:
        return USE_PALLAS
    return jax.default_backend() == "tpu"


def _edge_terms(T, Xw, uv, K, mask, info, use_huber):
    """Residuals, IRLS weights, per-edge J [E,2,6]; masked edges zeroed.

    `info` is the per-edge measurement information (InvSigma2 * I2, the
    upstream per-octave weighting): the returned e2 is the INFORMATION-
    WEIGHTED chi2 (g2o edge->chi2() = r^T Omega r) and the IRLS weight
    already folds info in, so H = J^T w J matches g2o exactly.
    """
    R = T[:3, :3]
    t = T[:3, 3]
    Xc = Xw @ R.T + t
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z = jnp.where(Xc[:, 2] == 0, 1.0, Xc[:, 2])
    pred = jnp.stack([fx * Xc[:, 0] / z + cx, fy * Xc[:, 1] / z + cy], axis=-1)
    r = pred - uv  # [E,2]
    e2 = jnp.sum(r * r, axis=-1) * info
    w = lm.huber_weight(e2, use_huber) * info * mask
    Jp = lm.projection_jacobians(Xc, fx, fy)  # [E,2,3]
    Jx = lm.se3_point_jacobian(Xc)  # [E,3,6]
    J = jnp.einsum("eij,ejk->eik", Jp, Jx)  # [E,2,6]
    return r, e2, w, J


def _round(T_init, Xw, uv, K, mask, info, use_huber, dtype):
    """One reference 'round': 10 LM iterations from T_init with a fixed mask.

    The edge terms (residuals/weights/Jacobians) at the CURRENT pose are
    carried across iterations: each step evaluates them once — at the
    trial pose — and keeps them on acceptance. The naive form evaluates
    twice per step (once for H/b at T, once for chi2 at T_new); on TPU the
    whole LM chain is sequential-latency-bound, so halving the evals per
    step nearly halves the chain. Bit-identical to the two-eval form.
    """

    def chi2_from(e2):
        return jnp.sum(lm.huber_rho(e2, use_huber) * mask)

    r0, e20, w0, J0 = _edge_terms(T_init, Xw, uv, K, mask, info, use_huber)
    H0 = jnp.einsum("eik,e,eil->kl", J0, w0, J0)
    lam0 = lm.TAU * jnp.max(jnp.diag(H0))
    chi0 = chi2_from(e20)

    def step(carry, _):
        T, lam, nu, chi, r, w, J = carry
        H = jnp.einsum("eik,e,eil->kl", J, w, J)
        b = jnp.einsum("eik,e,ei->k", J, w, r)
        A = H + lam * jnp.eye(6, dtype=dtype)
        delta = -jnp.linalg.solve(A, b)
        T_new = se3.exp_se3(delta) @ T
        r_n, e2_n, w_n, J_n = _edge_terms(
            T_new, Xw, uv, K, mask, info, use_huber
        )
        chi_new = chi2_from(e2_n)
        # gain ratio: predicted decrease = delta^T(lambda*delta - b)
        denom = jnp.maximum(jnp.dot(delta, lam * delta - b), 1e-12)
        rho = (chi - chi_new) / denom
        accept = jnp.isfinite(chi_new) & (chi_new < chi)
        lam_n, nu_n = lm.nielsen_update(lam, nu, rho, accept)
        T_out = jnp.where(accept, T_new, T)
        chi_out = jnp.where(accept, chi_new, chi)
        keep = lambda new, old: jnp.where(accept, new, old)
        return (
            T_out, lam_n, nu_n, chi_out,
            keep(r_n, r), keep(w_n, w), keep(J_n, J),
        ), None

    # nu seeded from chi0 keeps the carry's sharding axes consistent under
    # shard_map (a replicated literal here breaks scan's vma matching)
    # unrolled: the chain is latency-bound on TPU and unrolling removes the
    # per-iteration while-loop dispatch (measured 1.94 -> 1.47 ms standalone
    # for the 4x10 schedule at 512 edges)
    (T_fin, *_), _ = jax.lax.scan(
        step,
        (T_init, lam0, jnp.full_like(chi0, 2.0), chi0, r0, w0, J0),
        None,
        length=N_ITERS,
        unroll=N_ITERS,
    )
    return T_fin


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def pose_optimize(T_init, Xw, uv, valid, K, info=None, use_pallas=None):
    """4x10 LM pose refinement with inter-round outlier reclassification.

    Args:
      T_init: [4,4] initial world->camera pose.
      Xw: [E,3] map-point positions (padded).
      uv: [E,2] observed pixels.
      valid: bool [E] true for real edges.
      K: [3,3] intrinsics.
      info: optional [E] per-edge information weights (InvSigma2; upstream
        ORB-SLAM2's per-octave weighting). None = identity (fork behavior,
        Optimizer.cc:141).
      use_pallas: explicit kernel choice (None = auto: the Pallas LM chain
        on TPU f32, XLA elsewhere). The multi-stream batched path pins
        False — under vmap the batched XLA solves vectorize while the
        latency-oriented Pallas chain serializes per stream.

    Returns:
      (T_opt [4,4], inlier bool [E], n_good i32) — n_good mirrors the
      reference's return nInitialCorrespondences - nBad (Optimizer.cc:333).
    """
    dtype = T_init.dtype
    if (
        _use_pallas(dtype)
        if use_pallas is None
        else (use_pallas and dtype == jnp.float32)
    ):
        from mono_slam_framework_tpu.optim import pose_opt_pallas

        return pose_opt_pallas.pose_optimize_pallas(
            T_init, Xw, uv, valid, K, info
        )
    Xw = Xw.astype(dtype)
    uv = uv.astype(dtype)
    if info is None:
        info = jnp.ones(Xw.shape[0], dtype)
    else:
        info = info.astype(dtype)

    def round_body(carry, it):
        inlier, _ = carry
        mask = (valid & inlier).astype(dtype)
        use_huber = it < 3  # kernel removed at it==2 end (Optimizer.cc:320)
        T_fin = _round(T_init, Xw, uv, K, mask, info, use_huber, dtype)
        # reclassify ALL edges by chi2 (r^T Omega r) at the new pose
        # (Optimizer.cc:300-321)
        _, e2, _, _ = _edge_terms(
            T_fin, Xw, uv, K, valid.astype(dtype), info, jnp.asarray(False)
        )
        new_inlier = e2 <= lm.CHI2_MONO
        return (new_inlier, T_fin), None

    init_inlier = jnp.ones_like(valid)
    (inlier, T_fin), _ = jax.lax.scan(
        round_body, (init_inlier, T_init), jnp.arange(N_ROUNDS),
        unroll=N_ROUNDS,
    )
    inlier = inlier & valid
    n_good = jnp.sum(inlier.astype(jnp.int32))
    # g2o returns SE3Quat-backed estimates (exactly orthonormal); project the
    # matrix-backed result likewise or the tracking composition loop amplifies
    # off-manifold error exponentially (see se3.orthonormalize)
    return se3.orthonormalize(T_fin), inlier, n_good
