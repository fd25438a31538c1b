"""Independent float64 numpy LM oracle for optimizer parity tests.

Implements the same mathematical problem as mono_slam_framework_tpu.optim
(g2o-style robust LM over SE3 poses + landmarks) but with a completely
different implementation strategy: dense full normal equations in float64,
no Schur complement, no batching. Used to check the TPU f32 Schur solver to
the BASELINE.md target (<= 1e-3 reprojection RMSE difference).
"""

from __future__ import annotations

import numpy as np

HUBER_DELTA2 = 5.991
TAU = 1e-5


def _exp_se3(xi):
    w, v = xi[:3], xi[3:]
    th = np.linalg.norm(w)
    W = np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], dtype=np.float64
    )
    if th < 1e-10:
        R = np.eye(3) + W
        V = np.eye(3) + 0.5 * W
    else:
        A = np.sin(th) / th
        B = (1 - np.cos(th)) / th**2
        C = (1 - A) / th**2
        R = np.eye(3) + A * W + B * (W @ W)
        V = np.eye(3) + B * W + C * (W @ W)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ v
    return T


def _terms(T, X, uv, K):
    R, t = T[:3, :3], T[:3, 3]
    Xc = X @ R.T + t
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z = Xc[:, 2]
    zs = np.where(z == 0, 1.0, z)
    pred = np.stack([fx * Xc[:, 0] / zs + cx, fy * Xc[:, 1] / zs + cy], -1)
    r = pred - uv
    e2 = np.sum(r * r, -1)
    Jp = np.zeros((len(X), 2, 3))
    Jp[:, 0, 0] = fx / zs
    Jp[:, 0, 2] = -fx * Xc[:, 0] / zs**2
    Jp[:, 1, 1] = fy / zs
    Jp[:, 1, 2] = -fy * Xc[:, 1] / zs**2
    Jx = np.zeros((len(X), 3, 6))
    for i, Xci in enumerate(Xc):
        x, y, zz = Xci
        Jx[i] = np.array(
            [
                [0, zz, -y, 1, 0, 0],
                [-zz, 0, x, 0, 1, 0],
                [y, -x, 0, 0, 0, 1],
            ]
        )
    Jc = np.einsum("eij,ejk->eik", Jp, Jx)
    Jpt = np.einsum("eij,jk->eik", Jp, R)
    return r, e2, Jc, Jpt, Xc[:, 2]


def _hw(e2, robust):
    if not robust:
        return np.ones_like(e2)
    d = np.sqrt(HUBER_DELTA2)
    return np.where(e2 <= HUBER_DELTA2, 1.0, d / np.sqrt(np.maximum(e2, 1e-12)))


def _hrho(e2, robust):
    if not robust:
        return e2
    d = np.sqrt(HUBER_DELTA2)
    return np.where(e2 <= HUBER_DELTA2, e2, 2 * d * np.sqrt(e2) - HUBER_DELTA2)


def pose_lm(T0, X, uv, mask, K, n_iters, robust, info=None):
    """10-iteration-style LM for a single pose; returns final T.

    `info` = per-edge information weights (InvSigma2); chi2 and IRLS weights
    are information-weighted like g2o's edge->chi2().
    """
    T = T0.copy()
    if info is None:
        info = np.ones(len(X))

    def chi(Tc):
        _, e2, _, _, _ = _terms(Tc, X, uv, K)
        return np.sum(_hrho(e2 * info, robust) * mask)

    r, e2, Jc, _, _ = _terms(T, X, uv, K)
    w = _hw(e2 * info, robust) * info * mask
    H = np.einsum("eik,e,eil->kl", Jc, w, Jc)
    lam = TAU * H.diagonal().max()
    nu = 2.0
    c = chi(T)
    for _ in range(n_iters):
        r, e2, Jc, _, _ = _terms(T, X, uv, K)
        w = _hw(e2 * info, robust) * info * mask
        H = np.einsum("eik,e,eil->kl", Jc, w, Jc)
        b = np.einsum("eik,e,ei->k", Jc, w, r)
        delta = -np.linalg.solve(H + lam * np.eye(6), b)
        Tn = _exp_se3(delta) @ T
        cn = chi(Tn)
        rho = (c - cn) / max(delta @ (lam * delta - b), 1e-12)
        if np.isfinite(cn) and cn < c:
            T, c = Tn, cn
            lam *= max(1 / 3, 1 - (2 * rho - 1) ** 3)
            nu = 2.0
        else:
            lam *= nu
            nu *= 2.0
    return T


def pose_optimize_oracle(T0, X, uv, valid, K, info=None):
    """Mirror of optim.pose_optimize: 4 rounds x 10 iters, restart each round."""
    if info is None:
        info = np.ones(len(X))
    inlier = np.ones(len(X), bool)
    T_fin = T0
    for rnd in range(4):
        mask = (valid & inlier).astype(np.float64)
        T_fin = pose_lm(T0, X, uv, mask, K, 10, robust=rnd < 3, info=info)
        _, e2, _, _, _ = _terms(T_fin, X, uv, K)
        inlier = e2 * info <= HUBER_DELTA2
    inlier &= valid
    return T_fin, inlier


def ba_lm(cams, fixed, X, e_cam, e_pt, uv, emask, K, n_iters, robust, info=None):
    """Dense full-Hessian BA in f64 (no Schur) with the same LM policy."""
    C, P = len(cams), len(X)
    cams = [c.copy() for c in cams]
    X = X.copy()
    if info is None:
        info = np.ones(len(e_cam))

    def all_terms(cs, Xp):
        rs = np.zeros((len(e_cam), 2))
        e2 = np.zeros(len(e_cam))
        Jc = np.zeros((len(e_cam), 2, 6))
        Jp = np.zeros((len(e_cam), 2, 3))
        zs = np.zeros(len(e_cam))
        for e in range(len(e_cam)):
            r, ee, jc, jp, z = _terms(
                cs[e_cam[e]], Xp[e_pt[e]][None], uv[e][None], K
            )
            rs[e], e2[e], Jc[e], Jp[e], zs[e] = r[0], ee[0], jc[0], jp[0], z[0]
        return rs, e2, Jc, Jp, zs

    def chi(cs, Xp):
        _, e2, _, _, _ = all_terms(cs, Xp)
        return np.sum(_hrho(e2 * info, robust) * emask)

    n = 6 * C + 3 * P

    def build(cs, Xp):
        r, e2, Jc, Jp, _ = all_terms(cs, Xp)
        w = _hw(e2 * info, robust) * info * emask
        H = np.zeros((n, n))
        b = np.zeros(n)
        for e in range(len(e_cam)):
            ci, pi = e_cam[e], e_pt[e]
            co, po = 6 * ci, 6 * C + 3 * pi
            H[co : co + 6, co : co + 6] += w[e] * Jc[e].T @ Jc[e]
            H[po : po + 3, po : po + 3] += w[e] * Jp[e].T @ Jp[e]
            H[co : co + 6, po : po + 3] += w[e] * Jc[e].T @ Jp[e]
            H[po : po + 3, co : co + 6] += w[e] * Jp[e].T @ Jc[e]
            b[co : co + 6] += w[e] * Jc[e].T @ r[e]
            b[po : po + 3] += w[e] * Jp[e].T @ r[e]
        return H, b

    H, _ = build(cams, X)
    lam = TAU * H.diagonal().max()
    nu = 2.0
    c = chi(cams, X)
    for _ in range(n_iters):
        H, b = build(cams, X)
        # fix cameras
        for ci in range(C):
            if fixed[ci]:
                o = 6 * ci
                H[o : o + 6, :] = 0
                H[:, o : o + 6] = 0
                H[o : o + 6, o : o + 6] = np.eye(6)
                b[o : o + 6] = 0
        delta = -np.linalg.solve(H + lam * np.eye(n), b)
        cn_cams = [
            cams[ci] if fixed[ci] else _exp_se3(delta[6 * ci : 6 * ci + 6]) @ cams[ci]
            for ci in range(C)
        ]
        cn_X = X + delta[6 * C :].reshape(P, 3)
        cn = chi(cn_cams, cn_X)
        rho = (c - cn) / max(delta @ (lam * delta - b), 1e-12)
        if np.isfinite(cn) and cn < c:
            cams, X, c = cn_cams, cn_X, cn
            lam *= max(1 / 3, 1 - (2 * rho - 1) ** 3)
            nu = 2.0
        else:
            lam *= nu
            nu *= 2.0
    return cams, X


def reproj_rmse(cams, X, e_cam, e_pt, uv, emask, K):
    errs = []
    for e in range(len(e_cam)):
        if not emask[e]:
            continue
        r, _, _, _, _ = _terms(cams[e_cam[e]], X[e_pt[e]][None], uv[e][None], K)
        errs.append(r[0])
    errs = np.array(errs)
    return float(np.sqrt(np.mean(np.sum(errs**2, -1))))
