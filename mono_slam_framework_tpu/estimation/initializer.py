"""Two-view SfM bootstrap: batched H/F RANSAC + model selection + CheckRT.

Capability twin of the reference Initializer (slam_pipeline/src/Initializer.cc):
200-iteration 8-point RANSAC for a homography and a fundamental matrix
(reference: two host threads, 99-135), model selection RH = SH/(SH+SF) > 0.40
(137-147), ReconstructF via essential decomposition with 4 hypotheses
(489-583), ReconstructH via Faugeras with 8 hypotheses (585-742), and
cheirality/reprojection/parallax gating in CheckRT (806-914).

TPU design: all 200 hypotheses are estimated and scored in one `vmap` — the
minimal-set SVDs are [200,16,9]/[200,8,9] batched; scoring is a [200,N]
broadcast. Reconstruction triangulates every correspondence for every motion
hypothesis at once. Randomness is an explicit jax.random key (fixes reference
quirk B8 — fresh std::random_device seeds per call).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mono_slam_framework_tpu.geometry import epipolar, triangulation


class InitResult(NamedTuple):
    success: bool
    R21: np.ndarray  # [3,3] rotation of camera 2 w.r.t. camera 1
    t21: np.ndarray  # [3]
    points3d: np.ndarray  # [N,3] in camera-1 (=world) frame
    triangulated: np.ndarray  # bool [N]
    used_homography: bool


def _sample_minimal_sets(key, valid, iterations):
    """[iterations, 8] distinct valid indices via random-key top-k."""
    n = valid.shape[0]
    r = jax.random.uniform(key, (iterations, n))
    r = jnp.where(valid[None, :], r, -jnp.inf)
    _, idx = jax.lax.top_k(r, 8)
    return idx


@functools.partial(jax.jit, static_argnames=("iterations",))
def ransac_h_f(xy1, xy2, valid, key, sigma, iterations=200):
    """Batched H and F RANSAC over shared minimal sets (Initializer.cc:99-135).

    Returns (H21, score_h, inliers_h, F21, score_f, inliers_f).
    """
    n1, T1 = epipolar.normalize_points(xy1, valid)
    n2, T2 = epipolar.normalize_points(xy2, valid)
    sets = _sample_minimal_sets(key, valid, iterations)  # [it, 8]
    p1 = n1[sets]  # [it, 8, 2]
    p2 = n2[sets]

    Hn = jax.vmap(epipolar.compute_homography)(p1, p2)  # [it,3,3]
    Fn = jax.vmap(epipolar.compute_fundamental)(p1, p2)
    T2inv = jnp.linalg.inv(T2)
    H = T2inv @ Hn @ T1
    F = T2.T @ Fn @ T1

    def score_h(Hi):
        return epipolar.score_homography(
            Hi, jnp.linalg.inv(Hi), xy1, xy2, valid, sigma
        )

    def score_f(Fi):
        return epipolar.score_fundamental(Fi, xy1, xy2, valid, sigma)

    sh, inl_h = jax.vmap(score_h)(H)
    sf, inl_f = jax.vmap(score_f)(F)
    bh = jnp.argmax(sh)
    bf = jnp.argmax(sf)

    # Refit on all RANSAC inliers (masked full-N DLT) and rescore. The
    # reference keeps the raw minimal-set model (Initializer.cc:185-196),
    # whose noise-amplified geometry often fails ReconstructF's 0.9N support
    # gate; one inlier refit is a single extra batched SVD on TPU and
    # strictly improves the model. Deliberate, documented divergence.
    w_h = inl_h[bh].astype(xy1.dtype)
    w_f = inl_f[bf].astype(xy1.dtype)
    H_refit = T2inv @ epipolar.compute_homography(n1, n2, w_h) @ T1
    F_refit = T2.T @ epipolar.compute_fundamental(n1, n2, w_f) @ T1
    sh2, inl_h2 = score_h(H_refit)
    sf2, inl_f2 = score_f(F_refit)
    # Keep whichever of raw/refit scores higher (refit can only help when the
    # inlier set was clean; guard against degenerate masks).
    use_h2 = sh2 > sh[bh]
    use_f2 = sf2 > sf[bf]
    H_best = jnp.where(use_h2, H_refit, H[bh])
    sh_best = jnp.where(use_h2, sh2, sh[bh])
    inl_h_best = jnp.where(use_h2, inl_h2, inl_h[bh])
    F_best = jnp.where(use_f2, F_refit, F[bf])
    sf_best = jnp.where(use_f2, sf2, sf[bf])
    inl_f_best = jnp.where(use_f2, inl_f2, inl_f[bf])
    return H_best, sh_best, inl_h_best, F_best, sf_best, inl_f_best


def check_rt(R, t, xy1, xy2, inliers, K, th2, dtype=jnp.float32):
    """Triangulate + gate one motion hypothesis (Initializer::CheckRT, 806-914).

    Returns (ngood, parallax_deg, X [N,3], good bool [N]).
    """
    P1 = jnp.concatenate([K, jnp.zeros((3, 1), dtype)], axis=1)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
    X, w = triangulation.triangulate_dlt(xy1, xy2, P1, P2)
    finite = jnp.isfinite(X).all(axis=-1) & (w != 0)

    O2 = -R.T @ t
    n1v = X  # camera-1 center is the origin
    n2v = X - O2
    d1 = jnp.linalg.norm(n1v, axis=-1)
    d2 = jnp.linalg.norm(n2v, axis=-1)
    denom = jnp.where(d1 * d2 == 0, 1.0, d1 * d2)
    cos_par = jnp.sum(n1v * n2v, axis=-1) / denom

    Xc2 = X @ R.T + t
    # depth gates apply only when parallax is meaningful (806-873)
    z1_ok = (X[:, 2] > 0) | (cos_par >= 0.99998)
    z2_ok = (Xc2[:, 2] > 0) | (cos_par >= 0.99998)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def reproj_err(Xc, uv):
        z = jnp.where(Xc[:, 2] == 0, 1.0, Xc[:, 2])
        u = fx * Xc[:, 0] / z + cx
        v = fy * Xc[:, 1] / z + cy
        return (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2

    e1_ok = reproj_err(X, xy1) <= th2
    e2_ok = reproj_err(Xc2, xy2) <= th2

    counted = inliers & finite & z1_ok & z2_ok & e1_ok & e2_ok
    ngood = jnp.sum(counted)
    # vbGood additionally requires real parallax (Initializer.cc:902)
    good = counted & (cos_par < 0.99998)

    # parallax at the 50th-smallest cos among counted points (905-911)
    cos_sorted = jnp.sort(jnp.where(counted, cos_par, jnp.inf))
    idx = jnp.minimum(50, jnp.maximum(ngood - 1, 0))
    pick = jnp.clip(cos_sorted[idx], -1.0, 1.0)
    parallax = jnp.where(
        ngood > 0, jnp.degrees(jnp.arccos(pick)), 0.0
    )
    return ngood, parallax, X, good


@jax.jit
def reconstruct_f(F21, K, xy1, xy2, inliers, sigma2, min_parallax, min_triangulated):
    """4-hypothesis essential reconstruction (Initializer::ReconstructF)."""
    E = K.T @ F21 @ K
    R1, R2, t = epipolar.decompose_essential(E)
    Rs = jnp.stack([R1, R2, R1, R2])
    ts = jnp.stack([t, t, -t, -t])
    th2 = 4.0 * sigma2

    ngood, par, X, good = jax.vmap(
        lambda R, tt: check_rt(R, tt, xy1, xy2, inliers, K, th2)
    )(Rs, ts)

    N = jnp.sum(inliers)
    max_good = jnp.max(ngood)
    n_min_good = jnp.maximum((0.9 * N).astype(jnp.int32), min_triangulated)
    nsimilar = jnp.sum(ngood > 0.7 * max_good)
    best = jnp.argmax(ngood)
    ok = (
        (max_good >= n_min_good)
        & (nsimilar == 1)
        & (par[best] > min_parallax)
    )
    return ok, Rs[best], ts[best], X[best], good[best]


@jax.jit
def reconstruct_h(H21, K, xy1, xy2, inliers, sigma2, min_parallax, min_triangulated):
    """8-hypothesis Faugeras reconstruction (Initializer::ReconstructH)."""
    Rs, ts, decomp_ok = epipolar.decompose_homography_faugeras(H21, K)
    th2 = 4.0 * sigma2
    ngood, par, X, good = jax.vmap(
        lambda R, tt: check_rt(R, tt, xy1, xy2, inliers, K, th2)
    )(Rs, ts)

    N = jnp.sum(inliers)
    best = jnp.argmax(ngood)
    second_best = jnp.max(jnp.where(jnp.arange(8) == best, -1, ngood))
    # DELIBERATE DIVERGENCE from the reference: Initializer.cc:730 weakens the
    # support gate to min(0.9N, minTriangulated) and comments out the
    # second-best distinctness check (731) — which accepts Faugeras solutions
    # backed by as few as 25 points on ambiguous scenes and produces corrupt
    # initial maps. We restore the upstream-ORB-SLAM2-strength gate:
    # distinct winner + 90% support + minTriangulated + parallax.
    ok = (
        decomp_ok
        & (second_best < 0.75 * ngood[best])
        & (par[best] >= min_parallax)
        & (ngood[best] >= min_triangulated)
        & (ngood[best] > (0.9 * N).astype(jnp.int32))
    )
    return ok, Rs[best], ts[best], X[best], good[best]


@jax.jit
def _essential_direct(xy1, xy2, valid, K, sigma):
    """Direct (no-RANSAC) essential bootstrap used as an A/B oracle.

    Counterpart of the reference's alternate Initializer::InitializeOpenCV
    (Initializer.cc:39-73: cv::findEssentialMat + recoverPose): fit F on ALL
    correspondences, decompose the essential matrix, pick the motion by
    cheirality vote, triangulate.
    """
    n1, T1 = epipolar.normalize_points(xy1, valid)
    n2, T2 = epipolar.normalize_points(xy2, valid)
    F = T2.T @ epipolar.compute_fundamental(n1, n2, valid.astype(xy1.dtype)) @ T1
    _, inl = epipolar.score_fundamental(F, xy1, xy2, valid, sigma)
    E = K.T @ F @ K
    R1, R2, t = epipolar.decompose_essential(E)
    Rs = jnp.stack([R1, R2, R1, R2])
    ts = jnp.stack([t, t, -t, -t])
    ngood, par, X, good = jax.vmap(
        lambda R, tt: check_rt(R, tt, xy1, xy2, inl, K, 4.0 * sigma * sigma)
    )(Rs, ts)
    best = jnp.argmax(ngood)
    return Rs[best], ts[best], X[best], good[best], ngood[best]


class Initializer:
    """Host-side driver with the reference's selection policy.

    Matches Initializer::Initialize (Initializer.cc:75-150): run both models,
    pick by RH = SH/(SH+SF) > 0.40, reconstruct with the chosen model only.
    """

    def __init__(
        self,
        K: np.ndarray,
        sigma: float = 1.0,
        iterations: int = 200,
        model_fallback: bool = False,
    ):
        self.K = jnp.asarray(K, jnp.float32)
        self.sigma = float(sigma)
        self.iterations = int(iterations)
        self.model_fallback = bool(model_fallback)

    def prewarm_shapes(self, caps=(256, 512)) -> None:
        """Queue background compiles of the RANSAC + reconstruction programs
        for the given pow2 match-capacity buckets (utils/prewarm.py) so the
        first init attempt at each bucket does not stall on a relay compile.
        Specs mirror `initialize`'s call shapes exactly."""
        import jax as _jax

        from mono_slam_framework_tpu.utils.prewarm import prewarm

        sds = _jax.ShapeDtypeStruct
        for cap in caps:
            xy = sds((cap, 2), jnp.float32)
            vb = sds((cap,), jnp.bool_)
            key = sds((2,), jnp.uint32)
            prewarm(ransac_h_f, xy, xy, vb, key, self.sigma, self.iterations)
            model = sds((3, 3), jnp.float32)
            scalars = (
                jnp.float32(self.sigma * self.sigma),
                jnp.float32(1.1),
                jnp.int32(25),
            )
            prewarm(reconstruct_h, model, self.K, xy, xy, vb, *scalars)
            prewarm(reconstruct_f, model, self.K, xy, xy, vb, *scalars)

    def initialize(
        self,
        xy1: np.ndarray,
        xy2: np.ndarray,
        key,
        min_triangulated: int = 25,
        min_parallax: float = 1.1,
        valid: np.ndarray | None = None,
    ) -> InitResult:
        # pow2 capacity: every init attempt has a different match count, and
        # a distinct shape would recompile the whole RANSAC+reconstruction
        # stack per attempt (minutes each on a relay-attached TPU)
        n = int(np.asarray(xy1).shape[0])
        cap = max(64, 1 << (n - 1).bit_length()) if n else 64
        xy1p = np.zeros((cap, 2), np.float32)
        xy2p = np.zeros((cap, 2), np.float32)
        validp = np.zeros(cap, bool)
        xy1p[:n] = xy1
        xy2p[:n] = xy2
        validp[:n] = True if valid is None else np.asarray(valid, bool)
        xy1 = jnp.asarray(xy1p)
        xy2 = jnp.asarray(xy2p)
        valid_j = jnp.asarray(validp)

        H, sh, inl_h, F, sf, inl_f = ransac_h_f(
            xy1, xy2, valid_j, key, self.sigma, self.iterations
        )
        rh = float(sh) / max(float(sh) + float(sf), 1e-9)
        sigma2 = jnp.float32(self.sigma * self.sigma)

        def try_h():
            return reconstruct_h(
                H, self.K, xy1, xy2, inl_h, sigma2,
                jnp.float32(min_parallax), jnp.int32(min_triangulated),
            )

        def try_f():
            return reconstruct_f(
                F, self.K, xy1, xy2, inl_f, sigma2,
                jnp.float32(min_parallax), jnp.int32(min_triangulated),
            )

        # Model selection per the reference (RH > 0.40, Initializer.cc:142).
        # With model_fallback=True (opt-in), a failed reconstruction retries
        # the other model in the same attempt: on mostly-planar scenes RH
        # hovers just above 0.40 while the Faugeras solution is genuinely
        # ambiguous, so the fundamental path is the right model. The default
        # matches the reference (fail this frame, retry on the next one) —
        # the retry-with-more-baseline behavior doubles as a quality gate.
        used_h = rh > 0.40
        ok, R, t, X, good = try_h() if used_h else try_f()
        if self.model_fallback and not bool(ok):
            ok2, R2, t2, X2, good2 = try_f() if used_h else try_h()
            if bool(ok2):
                ok, R, t, X, good = ok2, R2, t2, X2, good2
                used_h = not used_h
        # slice per-point outputs back to the caller's length (the pow2
        # padding above is an internal capacity, not part of the contract)
        return InitResult(
            success=bool(ok),
            R21=np.asarray(R),
            t21=np.asarray(t),
            points3d=np.asarray(X)[:n],
            triangulated=np.asarray(good)[:n],
            used_homography=used_h,
        )

    def initialize_direct(
        self,
        xy1: np.ndarray,
        xy2: np.ndarray,
        min_triangulated: int = 25,
        valid: np.ndarray | None = None,
    ) -> InitResult:
        """Non-RANSAC essential bootstrap (the reference's InitializeOpenCV
        alternate, Initializer.cc:39-73) — useful as an independent oracle."""
        xy1 = jnp.asarray(xy1, jnp.float32)
        xy2 = jnp.asarray(xy2, jnp.float32)
        valid_j = (
            jnp.ones(xy1.shape[0], bool)
            if valid is None
            else jnp.asarray(valid, bool)
        )
        R, t, X, good, ngood = _essential_direct(
            xy1, xy2, valid_j, self.K, jnp.float32(self.sigma)
        )
        return InitResult(
            success=bool(ngood > min_triangulated),
            R21=np.asarray(R),
            t21=np.asarray(t),
            points3d=np.asarray(X),
            triangulated=np.asarray(good),
            used_homography=False,
        )
