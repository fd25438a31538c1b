"""Multi-chip scaling: the batched matcher A/B sweep.

The reference is a single-process, single-threaded-pipeline system with no
distributed backend (SURVEY.md §5 "distributed" row). The natural multi-chip
surface of this framework (BASELINE.json configs[4]) is throughput scaling:
run many sequence streams / matcher variants at once, data-parallel over a
`jax.sharding.Mesh`, each device executing the full per-frame tracking
compute (feature extraction -> matching -> pose LM).

Design: one 1-D 'data' mesh axis; the batch of frame-pair problems is
sharded over it with `shard_map`. Inside each shard the math is the same
single-chip jitted program, so ICI traffic is zero during the sweep (results
are gathered at the end) — the embarrassingly-parallel layout that maximizes
per-chip utilization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mono_slam_framework_tpu.ops import hamming, orb
from mono_slam_framework_tpu.optim.pose_opt import pose_optimize


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _pair_step(img1, img2, max_features: int, ratio: float):
    """Single-pair tracking compute: extract both, match, return matches."""
    f1 = orb.extract(img1, max_features)
    f2 = orb.extract(img2, max_features)
    d = hamming.distance_matrix(f1.desc, f2.desc, f1.valid, f2.valid)
    idx2, ok = hamming.knn2_ratio_match(d, ratio)
    ok = ok & f1.valid
    return f1.xy, f2.xy[idx2], ok


def sharded_matcher_sweep(
    mesh: Mesh,
    images1,
    images2,
    max_features: int = 512,
    ratio: float = 0.7,
):
    """Match a batch of frame pairs, sharded over the mesh's data axis.

    images1/images2: [B, H, W] with B divisible by the mesh size.
    Returns (xy1 [B,K,2], xy2 [B,K,2], ok [B,K]).
    """

    def shard_fn(i1, i2):
        return jax.vmap(lambda a, b: _pair_step(a, b, max_features, ratio))(i1, i2)

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=(P("data"), P("data"), P("data")),
        )
    )
    return fn(images1, images2)


def sharded_loftr_sweep(mesh: Mesh, feats1, feats2, max_matches: int = 256):
    """Data-parallel LoFTR A/B surface: a batch of encoded feature pairs
    sharded over the mesh, each device running the pairwise coarse
    transformer + top-k decode (models/loftr_native.py). Complements the
    token-sharded tensor-parallel variant in parallel/loftr_tp.py.

    feats1/feats2: [B, L, C] encoded frame features (B divisible by mesh
    size). Returns (vals [B, K], flat_idx [B, K]) per pair.
    """
    from mono_slam_framework_tpu.models import loftr_native

    params = loftr_native.load_params()

    def shard_fn(f1, f2):
        def one(a, b):
            vals, idx = loftr_native.match_features_topk(
                params, a[None], b[None], max_matches
            )
            return vals[0], idx[0]

        return jax.vmap(one)(f1, f2)

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=(P("data"), P("data")),
        )
    )
    return fn(feats1, feats2)


def sharded_tracking_step(
    mesh: Mesh,
    images1,
    images2,
    T_init,
    points,
    uv_obs,
    valid,
    K,
    max_features: int = 256,
    ratio: float = 0.7,
):
    """The FULL per-frame device compute, batched and sharded: ORB extraction
    on both images, Hamming matching, and motion-only pose LM — the ★ stages
    of SURVEY.md §3.1 as one SPMD program.

    Shapes: images [B,H,W]; T_init [B,4,4]; points [B,N,3]; uv_obs [B,N,2];
    valid [B,N]; K [3,3]. B divisible by mesh size.
    Returns (T_opt [B,4,4], n_inliers [B], n_matches [B]).
    """

    def one(i1, i2, T0, X, uv, v):
        xy1, xy2, ok = _pair_step(i1, i2, max_features, ratio)
        T_opt, inl, n_good = pose_optimize(T0, X, uv, v, K)
        return T_opt, n_good, jnp.sum(ok.astype(jnp.int32))

    def shard_fn(i1, i2, T0, X, uv, v):
        return jax.vmap(one)(i1, i2, T0, X, uv, v)

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P("data"),) * 6,
            out_specs=(P("data"), P("data"), P("data")),
        )
    )
    return fn(images1, images2, T_init, points, uv_obs, valid)
