"""Two-view epipolar / homography math, batched over RANSAC hypotheses.

Covers the linear-algebra core of the reference Initializer
(slam_pipeline/src/Initializer.cc): Hartley-style normalization (760-804),
8-point H/F estimation (246-320), symmetric transfer / epipolar scoring
(322-487), essential decomposition (916-934) and the Faugeras homography
decomposition (585-698). Everything is written to be `vmap`-ped over the
hypothesis axis — the reference's 200-iteration serial RANSAC loops become
one batched device call.
"""

from __future__ import annotations

import jax.numpy as jnp

CHI2_H = 5.991
CHI2_F = 3.841
CHI2_SCORE = 5.991


def normalize_points(xy, valid):
    """Zero-mean, unit mean-absolute-deviation normalization.

    Matches Initializer::Normalize (Initializer.cc:760-804): scale is
    1/mean(|x - mean|) per axis (not the usual RMS). `valid` masks padding.

    Returns (normalized [N,2], T [3,3]) with x_norm = T @ [x, 1].
    """
    valid_f = valid.astype(xy.dtype)
    n = jnp.maximum(jnp.sum(valid_f), 1.0)
    mean = jnp.sum(xy * valid_f[:, None], axis=0) / n
    centered = (xy - mean) * valid_f[:, None]
    mean_dev = jnp.sum(jnp.abs(centered), axis=0) / n
    mean_dev = jnp.where(mean_dev == 0, jnp.ones_like(mean_dev), mean_dev)
    s = 1.0 / mean_dev
    normed = centered * s
    T = jnp.array(
        [
            [s[0], 0.0, -mean[0] * s[0]],
            [0.0, s[1], -mean[1] * s[1]],
            [0.0, 0.0, 1.0],
        ],
        dtype=xy.dtype,
    )
    return normed, T


def compute_homography(p1, p2, weights=None):
    """DLT homography from >=4 correspondences (use 8, Initializer.cc:246-284).

    p1, p2: [M, 2] normalized points. Returns H21 [3,3] with p2 ~ H @ p1.
    Optional `weights` [M] zero out rows (masked least squares for refits).
    """
    u1, v1 = p1[:, 0], p1[:, 1]
    u2, v2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    rows_a = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    rows_b = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    if weights is not None:
        rows_a = rows_a * weights[:, None]
        rows_b = rows_b * weights[:, None]
    A = jnp.concatenate([rows_a, rows_b], axis=0)  # [2M, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[8].reshape(3, 3)


def compute_fundamental(p1, p2, weights=None):
    """8-point fundamental with rank-2 projection (Initializer.cc:286-320).

    p1, p2: [M, 2] normalized points. Returns F21 [3,3] with p2' F p1 = 0.
    Optional `weights` [M] zero out rows (masked least squares for refits).
    """
    u1, v1 = p1[:, 0], p1[:, 1]
    u2, v2 = p2[:, 0], p2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
    )  # [M, 9]
    if weights is not None:
        A = A * weights[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    Fpre = vt[8].reshape(3, 3)
    u, w, vt2 = jnp.linalg.svd(Fpre)
    w = w.at[2].set(0.0)
    return (u * w[None, :]) @ vt2


def score_homography(H21, H12, xy1, xy2, valid, sigma):
    """Symmetric transfer-error score (Initializer::CheckHomography, 322-407).

    Returns (score, inlier_mask). Outside-threshold terms add 0; an inlier
    needs both directions under chi2 5.991.
    """
    inv_sigma2 = 1.0 / (sigma * sigma)

    def transfer(Hm, a, b):
        # project a with Hm, compare to b
        w = Hm[2, 0] * a[:, 0] + Hm[2, 1] * a[:, 1] + Hm[2, 2]
        w = jnp.where(w == 0, jnp.full_like(w, jnp.inf), w)
        u = (Hm[0, 0] * a[:, 0] + Hm[0, 1] * a[:, 1] + Hm[0, 2]) / w
        v = (Hm[1, 0] * a[:, 0] + Hm[1, 1] * a[:, 1] + Hm[1, 2]) / w
        d2 = (b[:, 0] - u) ** 2 + (b[:, 1] - v) ** 2
        return d2 * inv_sigma2

    chi2_1 = transfer(H12, xy2, xy1)  # image-2 point mapped into image 1
    chi2_2 = transfer(H21, xy1, xy2)
    in1 = (chi2_1 <= CHI2_SCORE) & valid
    in2 = (chi2_2 <= CHI2_SCORE) & valid
    score = jnp.sum(jnp.where(in1, CHI2_SCORE - chi2_1, 0.0)) + jnp.sum(
        jnp.where(in2, CHI2_SCORE - chi2_2, 0.0)
    )
    return score, in1 & in2


def score_fundamental(F21, xy1, xy2, valid, sigma):
    """Epipolar-distance score (Initializer::CheckFundamental, 409-487).

    Scores against chi2 3.841 but accumulates (5.991 - chi2) per direction,
    matching the reference's asymmetric th/thScore constants.
    """
    inv_sigma2 = 1.0 / (sigma * sigma)
    o = jnp.ones_like(xy1[:, 0])
    x1 = jnp.stack([xy1[:, 0], xy1[:, 1], o], axis=-1)
    x2 = jnp.stack([xy2[:, 0], xy2[:, 1], o], axis=-1)
    l2 = x1 @ F21.T  # epipolar line in image 2 of x1
    l1 = x2 @ F21  # epipolar line in image 1 of x2
    num2 = jnp.sum(l2 * x2, axis=-1)
    num1 = jnp.sum(l1 * x1, axis=-1)
    d2_2 = num2 * num2 / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-20)
    d2_1 = num1 * num1 / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-20)
    chi2_2 = d2_2 * inv_sigma2
    chi2_1 = d2_1 * inv_sigma2
    in2 = (chi2_2 <= CHI2_F) & valid
    in1 = (chi2_1 <= CHI2_F) & valid
    score = jnp.sum(jnp.where(in2, CHI2_SCORE - chi2_2, 0.0)) + jnp.sum(
        jnp.where(in1, CHI2_SCORE - chi2_1, 0.0)
    )
    return score, in1 & in2


def decompose_essential(E):
    """E -> (R1, R2, t) candidate motions (Initializer::DecomposeE, 916-934).

    t is unit-norm; the caller tries +-t with both rotations.
    """
    u, _, vt = jnp.linalg.svd(E)
    t = u[:, 2]
    t = t / jnp.linalg.norm(t)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = u @ W @ vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = u @ W.T @ vt
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    return R1, R2, t


def decompose_homography_faugeras(H21, K):
    """Faugeras decomposition of a homography into 8 motion hypotheses.

    Mirrors Initializer::ReconstructH's hypothesis generation
    (Initializer.cc:599-698). Returns (Rs [8,3,3], ts [8,3], ok) where ok is
    False when the singular values are too close (degenerate, 612-614); in
    that case the outputs are garbage and must be ignored.
    """
    invK = jnp.linalg.inv(K)
    A = invK @ H21 @ K
    U, w, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = w[0], w[1], w[2]
    ok = (d1 / d2 >= 1.00001) & (d2 / d3 >= 1.00001)

    eps = 1e-12
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3 + eps), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3 + eps), 0.0))
    x1 = jnp.array([aux1, aux1, -aux1, -aux1], dtype=H21.dtype)
    x3 = jnp.array([aux3, -aux3, aux3, -aux3], dtype=H21.dtype)

    # case d' = d2
    aux_stheta = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / ((d1 + d3) * d2 + eps)
    ctheta = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2 + eps)
    stheta = jnp.array(
        [aux_stheta, -aux_stheta, -aux_stheta, aux_stheta], dtype=H21.dtype
    )

    def make_case1(i):
        Rp = jnp.eye(3, dtype=H21.dtype)
        Rp = Rp.at[0, 0].set(ctheta)
        Rp = Rp.at[0, 2].set(-stheta[i])
        Rp = Rp.at[2, 0].set(stheta[i])
        Rp = Rp.at[2, 2].set(ctheta)
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1[i], 0.0, -x3[i]], dtype=H21.dtype) * (d1 - d3)
        t = U @ tp
        t = t / jnp.maximum(jnp.linalg.norm(t), eps)
        return R, t

    # case d' = -d2
    aux_sphi = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / ((d1 - d3) * d2 + eps)
    cphi = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2 + eps)
    sphi = jnp.array([aux_sphi, -aux_sphi, -aux_sphi, aux_sphi], dtype=H21.dtype)

    def make_case2(i):
        Rp = jnp.eye(3, dtype=H21.dtype)
        Rp = Rp.at[0, 0].set(cphi)
        Rp = Rp.at[0, 2].set(sphi[i])
        Rp = Rp.at[1, 1].set(-1.0)
        Rp = Rp.at[2, 0].set(sphi[i])
        Rp = Rp.at[2, 2].set(-cphi)
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1[i], 0.0, x3[i]], dtype=H21.dtype) * (d1 + d3)
        t = U @ tp
        t = t / jnp.maximum(jnp.linalg.norm(t), eps)
        return R, t

    Rs, ts = [], []
    for i in range(4):
        R, t = make_case1(i)
        Rs.append(R)
        ts.append(t)
    for i in range(4):
        R, t = make_case2(i)
        Rs.append(R)
        ts.append(t)
    return jnp.stack(Rs), jnp.stack(ts), ok
