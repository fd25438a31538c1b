"""Mesh-sharded global bundle adjustment.

The loop-closure global BA (Optimizer.cc:62-215 at full-map scale) is the
one optimization whose edge count outgrows a single chip: every (keyframe,
map point) observation is an edge, and a long sequence carries hundreds of
thousands. The matrix-free PCG solver (optim/bundle_adjust.py,
`global_bundle_adjust`) is already O(E) segment-scatter work per CG
application — exactly the shape that data-parallelizes: shard the EDGES
across the device mesh, keep camera/landmark states replicated, and turn
every edge->global reduction into a `lax.psum` over the mesh axis.

Each device therefore holds E/D edges and runs the identical LM/PCG
schedule; the only communication is the [C,6,6]/[P,3,3]/[C,6]/[P,3]
reductions per iteration, which ride the ICI. The math is bit-identical to
the single-device cg path (psum of partial segment_sums == full
segment_sum), verified by tests/test_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mono_slam_framework_tpu.optim.bundle_adjust import BAProblem, _lm_iterations

AXIS = "edges"


def make_ba_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _pad_edges(p: BAProblem, ndev: int) -> BAProblem:
    """Pad the edge arrays to a multiple of the mesh size (invalid fill)."""
    E = p.e_cam.shape[0]
    cap = ((E + ndev - 1) // ndev) * ndev
    if cap == E:
        return p
    pad = cap - E

    def padv(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]
        )

    return p._replace(
        e_cam=padv(p.e_cam),
        e_pt=padv(p.e_pt),
        e_uv=padv(p.e_uv),
        e_valid=padv(p.e_valid, False),
        e_info=padv(p.e_info, 1.0),
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "n_iters", "robust", "cg_iters")
)
def _run(mesh, p: BAProblem, n_iters: int, robust: bool, cg_iters: int):
    eshard = P(AXIS)
    rep = P()

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            rep, rep, rep,  # cam_T, cam_fixed, points
            eshard, eshard, eshard, eshard, eshard,  # edge arrays
            rep,  # K
        ),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    def body(cam_T, cam_fixed, points, e_cam, e_pt, e_uv, e_valid, e_info, K):
        dummy = jnp.zeros(1, jnp.int32)
        local = BAProblem(
            cam_T=cam_T,
            cam_fixed=cam_fixed,
            points=points,
            e_cam=e_cam,
            e_pt=e_pt,
            e_uv=e_uv,
            e_valid=e_valid,
            e_info=e_info,
            pair_i=dummy,
            pair_j=dummy,
            pair_valid=dummy.astype(bool),
            K=K,
        )
        mask = e_valid.astype(cam_T.dtype)
        return _lm_iterations(
            cam_T,
            points,
            local,
            mask,
            jnp.asarray(robust),
            n_iters,
            cam_T.dtype,
            solver="cg",
            cg_iters=cg_iters,
            reduce=lambda x: jax.lax.psum(x, AXIS),
        )

    with jax.default_matmul_precision("float32"):
        return body(
            p.cam_T, p.cam_fixed, p.points,
            p.e_cam, p.e_pt, p.e_uv, p.e_valid, p.e_info, p.K,
        )


def global_bundle_adjust_sharded(
    mesh: Mesh,
    p: BAProblem,
    n_iters: int = 20,
    robust: bool = True,
    cg_iters: int = 60,
):
    """Edge-sharded SPMD twin of `global_bundle_adjust`.

    Returns (cam_T, points, chi2), numerically matching the single-device
    cg path (same LM schedule; psum-of-partials equals the full reduction).
    """
    ndev = mesh.devices.size
    p = _pad_edges(p, ndev)
    return _run(mesh, p, int(n_iters), bool(robust), int(cg_iters))
