"""Batched EPnP + RANSAC for relocalization.

Capability twin of the reference PnPsolver (slam_pipeline/include/PnPsolver.h,
src/PnPsolver.cc): EPnP (Lepetit et al.) minimal solver inside an adaptive
RANSAC loop with reference parameters (probability 0.99, minInliers 10,
maxIterations 300, minSet 4, epsilon 0.5, th2 5.991 — Tracking.cc:776), the
reference's iteration-count formula including its hardcoded epsilon^3
exponent (PnPsolver.cc:158-159), and refine-on-all-inliers with the strict
'>' accept (PnPsolver.cc:288).

TPU design: every RANSAC hypothesis runs simultaneously — minimal-set
selection, the 12x12 eigendecomposition, beta cases + Gauss-Newton, Horn
alignment and inlier counting are all vmapped. Reference quirk B2 (the
rep_errors[N] out-of-bounds case-selection typo) is fixed here: the best beta
case is chosen by actual reprojection error.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _control_points(X, w):
    """Weighted centroid + PCA control points. X [n,3], w [n] -> [4,3]."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.sum(X * w[:, None], axis=0) / wsum
    Xc = (X - c0) * w[:, None]
    cov = Xc.T @ Xc / wsum
    eval_, evec = jnp.linalg.eigh(cov)  # ascending
    # axes scaled by sqrt(eigenvalue); tiny floor keeps degenerate (planar)
    # sets solvable
    scales = jnp.sqrt(jnp.maximum(eval_, 1e-10))
    axes = evec.T * scales[:, None]  # [3,3] rows
    return jnp.concatenate([c0[None], c0[None] + axes], axis=0)  # [4,3]


def _barycentric(X, C):
    """alphas st X = sum_j alpha_j C_j, sum alpha = 1. X [n,3] -> [n,4]."""
    B = (C[1:] - C[0]).T  # [3,3]
    Binv = jnp.linalg.inv(B + 1e-12 * jnp.eye(3, dtype=X.dtype))
    a123 = (X - C[0]) @ Binv.T  # [n,3]
    a0 = 1.0 - jnp.sum(a123, axis=-1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=-1)


def _build_M(alphas, uv, K, w):
    """EPnP M matrix rows, weighted. -> [2n, 12]."""
    fu, fv = K[0, 0], K[1, 1]
    uc, vc = K[0, 2], K[1, 2]
    n = alphas.shape[0]
    a = alphas * w[:, None]  # weighting rows
    zero = jnp.zeros_like(a)
    du = (uc - uv[:, 0])[:, None] * alphas * w[:, None]
    dv = (vc - uv[:, 1])[:, None] * alphas * w[:, None]
    # row u: [a_j fu, 0, a_j (uc - u)] per control point j
    ru = jnp.stack([a * fu, zero, du], axis=-1).reshape(n, 12)
    rv = jnp.stack([zero, a * fv, dv], axis=-1).reshape(n, 12)
    return jnp.concatenate([ru, rv], axis=0)


def _dv_pairs(V):
    """Differences of candidate control-point solutions over the 6 pairs.

    V: [4,12] four smallest eigenvectors, each 4 control points x 3.
    Returns dv [6,4,3]: pair k, basis i.
    """
    Vr = V.reshape(4, 4, 3)  # [basis, ctrl, xyz]
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    dv = jnp.stack([Vr[:, a, :] - Vr[:, b, :] for a, b in pairs], axis=0)
    return dv  # [6,4,3]


def _rho(Cw):
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    return jnp.stack(
        [jnp.sum((Cw[a] - Cw[b]) ** 2) for a, b in pairs]
    )  # [6]


def _gauss_newton(betas, dv, rho, iters=6):
    """Refine betas so control-point distances match rho (PnPsolver GN)."""

    def body(b, _):
        e = jnp.einsum("kic,i->kc", dv, b)  # [6,3]
        r = jnp.sum(e * e, axis=-1) - rho  # [6]
        J = 2.0 * jnp.einsum("kc,kic->ki", e, dv)  # [6,4]
        JtJ = J.T @ J + 1e-9 * jnp.eye(4, dtype=b.dtype)
        delta = -jnp.linalg.solve(JtJ, J.T @ r)
        return b + delta, None

    b, _ = jax.lax.scan(body, betas, None, length=iters)
    return b


def _betas_seed(dv, rho, case):
    """Least-squares seeds mirroring find_betas_approx_{1,2,3}."""
    # products of betas appearing linearly: case1 -> b11; case2 -> b11,b12,b22;
    # case3 -> b11,b12,b22,b13,b23
    d = dv  # [6,4,3]
    g = jnp.einsum("kic,kjc->kij", d, d)  # [6,4,4] gram per pair

    def lsq(cols):
        A = jnp.stack(cols, axis=-1)  # [6, m]
        AtA = A.T @ A + 1e-9 * jnp.eye(A.shape[1], dtype=A.dtype)
        return jnp.linalg.solve(AtA, A.T @ rho)

    if case == 1:
        x = lsq([g[:, 0, 0]])
        b1 = jnp.sqrt(jnp.abs(x[0]))
        return jnp.stack([b1, 0.0 * b1, 0.0 * b1, 0.0 * b1])
    if case == 2:
        x = lsq([g[:, 0, 0], 2 * g[:, 0, 1], g[:, 1, 1]])
        b1 = jnp.sqrt(jnp.abs(x[0]))
        b2 = jnp.sqrt(jnp.abs(x[2])) * jnp.sign(x[1]) * jnp.sign(x[0])
        z = 0.0 * b1
        return jnp.stack([b1, b2, z, z])
    # case 3
    x = lsq([g[:, 0, 0], 2 * g[:, 0, 1], g[:, 1, 1], 2 * g[:, 0, 2], 2 * g[:, 1, 2]])
    b1 = jnp.sqrt(jnp.abs(x[0]))
    b2 = jnp.sqrt(jnp.abs(x[2])) * jnp.sign(x[1]) * jnp.sign(x[0])
    b3 = x[3] / jnp.where(b1 == 0, 1e-9, b1)
    z = 0.0 * b1
    return jnp.stack([b1, b2, b3, z])


def _horn(pw, pc, w):
    """Absolute orientation: R,t with pc ~ R pw + t (weighted)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    cw = jnp.sum(pw * w[:, None], axis=0) / wsum
    cc = jnp.sum(pc * w[:, None], axis=0) / wsum
    H = ((pw - cw) * w[:, None]).T @ (pc - cc)  # [3,3]
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.stack([1.0 + 0 * d, 1.0 + 0 * d, d]))
    R = Vt.T @ D @ U.T
    t = cc - R @ cw
    return R, t


def _epnp_pose(X, uv, K, w):
    """One EPnP solve on weighted correspondences. Returns (R, t, err2_mean)."""
    dtype = X.dtype
    Cw = _control_points(X, w)
    alphas = _barycentric(X, Cw)
    M = _build_M(alphas, uv, K, w)
    MtM = M.T @ M
    _, evec = jnp.linalg.eigh(MtM)  # ascending eigenvalues
    V = evec[:, :4].T  # [4,12] smallest four
    dv = _dv_pairs(V)
    rho = _rho(Cw)

    fu, fv = K[0, 0], K[1, 1]
    uc, vc = K[0, 2], K[1, 2]

    def pose_from_betas(betas):
        # camera-frame control points, then world points via alphas
        Cc = jnp.einsum("i,icx->cx", betas, V.reshape(4, 4, 3))
        pc = alphas @ Cc  # [n,3]
        # resolve the global sign so depths are positive
        sign = jnp.where(jnp.sum(pc[:, 2] * w) < 0, -1.0, 1.0)
        pc = pc * sign
        R, t = _horn(X, pc, w)
        Xc = X @ R.T + t
        z = jnp.where(Xc[:, 2] == 0, 1e-9, Xc[:, 2])
        u = fu * Xc[:, 0] / z + uc
        v = fv * Xc[:, 1] / z + vc
        err2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        mean_err = jnp.sum(err2 * w) / jnp.maximum(jnp.sum(w), 1e-9)
        return R, t, mean_err

    best_R = jnp.eye(3, dtype=dtype)
    best_t = jnp.zeros(3, dtype=dtype)
    best_err = jnp.asarray(jnp.inf, dtype)
    for case in (1, 2, 3):
        betas = _gauss_newton(_betas_seed(dv, rho, case), dv, rho)
        R, t, err = pose_from_betas(betas)
        better = err < best_err
        best_R = jnp.where(better, R, best_R)
        best_t = jnp.where(better, t, best_t)
        best_err = jnp.where(better, err, best_err)
    return best_R, best_t, best_err


def _count_inliers(R, t, X, uv, K, valid, th2):
    fu, fv = K[0, 0], K[1, 1]
    uc, vc = K[0, 2], K[1, 2]
    Xc = X @ R.T + t
    z = jnp.where(Xc[:, 2] == 0, 1e-9, Xc[:, 2])
    u = fu * Xc[:, 0] / z + uc
    v = fv * Xc[:, 1] / z + vc
    err2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
    # strict '<' (PnPsolver.cc:324)
    inl = (err2 < th2) & valid
    return inl, jnp.sum(inl)


@functools.partial(jax.jit, static_argnames=("iterations", "min_set"))
def _ransac_epnp(X, uv, valid, K, key, th2, iterations, min_set):
    """All RANSAC hypotheses in one program. Returns best (R, t, inliers, n)."""
    n = X.shape[0]
    r = jax.random.uniform(key, (iterations, n))
    r = jnp.where(valid[None, :], r, -jnp.inf)
    _, sets = jax.lax.top_k(r, min_set)  # [it, min_set]

    def one(idx):
        Xs = X[idx]
        uvs = uv[idx]
        w = jnp.ones(min_set, X.dtype)
        R, t, _ = _epnp_pose(Xs, uvs, K, w)
        inl, cnt = _count_inliers(R, t, X, uv, K, valid, th2)
        return R, t, inl, cnt

    Rs, ts, inls, cnts = jax.vmap(one)(sets)
    best = jnp.argmax(cnts)
    return Rs[best], ts[best], inls[best], cnts[best]


def prewarm_shapes(caps=(256, 512), iteration_buckets=(64, 256), min_set=4) -> None:
    """Queue background compiles of the EPnP RANSAC programs for the given
    pow2 point-capacity / iteration buckets (utils/prewarm.py), so the first
    relocalization attempt does not stall on a relay compile. Specs mirror
    `solve_pnp_ransac`'s call shapes exactly."""
    from mono_slam_framework_tpu.utils.prewarm import prewarm

    sds = jax.ShapeDtypeStruct
    for cap in caps:
        Xs = sds((cap, 3), jnp.float32)
        uvs = sds((cap, 2), jnp.float32)
        vb = sds((cap,), jnp.bool_)
        Ks = sds((3, 3), jnp.float32)
        key = sds((2,), jnp.uint32)
        th2 = jnp.float32(5.991)
        for it in iteration_buckets:
            prewarm(_ransac_epnp, Xs, uvs, vb, Ks, key, th2, it, min_set)
        prewarm(_refine_epnp, Xs, uvs, Ks, sds((cap,), jnp.float32), vb, th2)


@jax.jit
def _refine_epnp(X, uv, K, weights, valid, th2):
    R, t, _ = _epnp_pose(X, uv, K, weights)
    inl, cnt = _count_inliers(R, t, X, uv, K, valid, th2)
    return R, t, inl, cnt


def solve_pnp_ransac(
    X: np.ndarray,
    uv: np.ndarray,
    K: np.ndarray,
    key,
    probability: float = 0.99,
    min_inliers: int = 10,
    max_iterations: int = 300,
    min_set: int = 4,
    epsilon: float = 0.5,
    chi2_threshold: float = 5.991,
):
    """Host driver mirroring PnPsolver::SetRansacParameters + iterate + Refine.

    Returns (ok, Tcw [4,4] f32, inlier_mask [N] bool).
    """
    N = len(X)
    if N < min_set:
        return False, None, np.zeros(N, bool)
    # adaptive parameters (PnPsolver.cc:143-161)
    n_min_inliers = max(int(N * epsilon), min_inliers, min_set)
    if N < n_min_inliers:
        # fewer correspondences than the required inlier support: eps would
        # exceed 1 and the iteration formula NaNs (log of a negative) —
        # unsolvable, reject before touching the math
        return False, None, np.zeros(N, bool)
    eps = max(epsilon, n_min_inliers / N)
    if n_min_inliers == N:
        n_iter = 1
    else:
        # reference hardcodes the epsilon^3 exponent (PnPsolver.cc:159)
        n_iter = int(np.ceil(np.log(1 - probability) / np.log(1 - eps**3)))
    n_iter = max(1, n_iter)
    # pow2 bucket: `iterations` is a static jit arg, so every distinct
    # adaptive count would compile a new program (minutes on a
    # relay-attached TPU). Rounding UP only strengthens the RANSAC
    # success-probability guarantee (PnPsolver.cc:159 computes a minimum) —
    # but the caller's max_iterations stays a hard cost bound, so round to
    # pow2 first and clamp to the pow2 at-or-below max_iterations after.
    n_iter = 1 << (n_iter - 1).bit_length()
    if n_iter > max_iterations:
        n_iter = max(1, 1 << (int(max_iterations).bit_length() - 1))

    cap = max(8, 1 << (N - 1).bit_length())
    Xp = np.zeros((cap, 3), np.float32)
    uvp = np.zeros((cap, 2), np.float32)
    validp = np.zeros(cap, bool)
    Xp[:N] = X
    uvp[:N] = uv
    validp[:N] = True

    R, t, inl, cnt = _ransac_epnp(
        jnp.asarray(Xp),
        jnp.asarray(uvp),
        jnp.asarray(validp),
        jnp.asarray(K, jnp.float32),
        key,
        jnp.float32(chi2_threshold),
        n_iter,
        min_set,
    )
    if int(cnt) < n_min_inliers:
        return False, None, np.zeros(N, bool)

    # refine on all inliers (PnPsolver::Refine, 259-300)
    w = np.asarray(inl).astype(np.float32)
    R2, t2, inl2, cnt2 = _refine_epnp(
        jnp.asarray(Xp),
        jnp.asarray(uvp),
        jnp.asarray(K, jnp.float32),
        jnp.asarray(w),
        jnp.asarray(validp),
        jnp.float32(chi2_threshold),
    )
    if int(cnt2) > n_min_inliers:  # strict '>' (PnPsolver.cc:288)
        R, t, inl = R2, t2, inl2

    Tcw = np.eye(4, dtype=np.float32)
    Tcw[:3, :3] = np.asarray(R)
    Tcw[:3, 3] = np.asarray(t)
    return True, Tcw, np.asarray(inl)[:N]
