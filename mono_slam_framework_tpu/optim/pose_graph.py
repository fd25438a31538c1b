"""Pose-graph (essential-graph) optimization for loop correction.

Upstream ORB-SLAM2 distributes a detected loop's correction around the
whole trajectory with OptimizeEssentialGraph (g2o Sim3 pose graph) BEFORE
the (optional) global BA; the reference fork dropped that step along with
the Sim3 solver (/root/reference/slam_pipeline/src/LoopClosing.cc:101-115
runs only a global BA), which measures as a no-op on a genuine loop: the
bare BA cannot remove drift that is reprojection-consistent leg by leg —
only the handful of cross-loop constraints pull, and the interior stays
bent (measured ate_loop_before == after on the rect-loop hard world,
QUIRKS.md "loop fuse default").

TPU design: the whole damped Gauss-Newton schedule runs as ONE jitted
device program over padded static shapes. Nodes are SE(3) world->camera
poses (the measured loop scale on the hard world is ~1.0; the Sim(3)
scale gate lives in the loop-fit, geometry/sim3.py::fit_sim3_robust);
edges carry relative-pose measurements T_ij = T_i @ T_j^-1 captured from
the pre-correction estimates, plus the loop edge from the fitted loop
correction. Per iteration the dense [6E, 6N] Jacobian comes from forward-
mode autodiff of the stacked edge residuals r_k = log_se3(T_meas^-1 T_i
T_j^-1) at the current linearization point — at essential-graph sizes
(N <= 64, E <= 512 after padding) the normal-equation solve is a 384x384
dense system, far below MXU granularity, so one program with a fori_loop
over iterations beats any host round-tripping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mono_slam_framework_tpu.geometry import se3


def _edge_residuals(T_nodes, e_i, e_j, T_meas_inv, w_sqrt):
    """Stacked weighted residuals [E, 6]."""
    Ti = T_nodes[e_i]
    Tj = T_nodes[e_j]
    rel = jax.vmap(lambda a, b: se3.compose(a, se3.inverse(b)))(Ti, Tj)
    r = jax.vmap(lambda m, x: se3.log_se3(se3.compose(m, x)))(T_meas_inv, rel)
    return r * w_sqrt[:, None]


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(
    T_nodes,  # [N,4,4] f32 world->camera poses (initial estimate)
    fixed,  # [N] bool — gauge anchors (kept exactly)
    e_i,  # [E] i32 node index (padded edges point at 0)
    e_j,  # [E] i32
    T_meas,  # [E,4,4] f32 measured T_i @ T_j^-1
    e_valid,  # [E] bool
    e_weight,  # [E] f32
    iters: int = 15,
    damping: float = 1e-6,
):
    """Damped GN on the SE(3) pose graph; returns (T_opt [N,4,4], final_cost)."""
    N = T_nodes.shape[0]
    f32 = jnp.float32
    T0 = T_nodes.astype(f32)
    w_sqrt = jnp.sqrt(jnp.where(e_valid, e_weight, 0.0)).astype(f32)
    T_meas_inv = jax.vmap(se3.inverse)(T_meas.astype(f32))
    free = (~fixed).astype(f32)  # [N]
    free6 = jnp.repeat(free, 6)  # [6N]

    def body(_, T_cur):
        def res_of(xi_flat):
            xi = xi_flat.reshape(N, 6)
            T = jax.vmap(lambda x, t: se3.compose(se3.exp_se3(x), t))(
                xi, T_cur
            )
            return _edge_residuals(T, e_i, e_j, T_meas_inv, w_sqrt).reshape(-1)

        zero = jnp.zeros(N * 6, f32)
        r0 = res_of(zero)
        J = jax.jacfwd(res_of)(zero)  # [6E, 6N]
        # freeze fixed nodes: zero their columns, unit diagonal
        J = J * free6[None, :]
        H = J.T @ J
        g = J.T @ r0
        lam = damping * (jnp.trace(H) / (N * 6) + 1.0)
        H = H + lam * jnp.eye(N * 6, dtype=f32)
        H = H + jnp.diag(1.0 - free6)  # keep fixed blocks invertible
        dx = -jnp.linalg.solve(H, g) * free6
        xi = dx.reshape(N, 6)
        T_new = jax.vmap(lambda x, t: se3.compose(se3.exp_se3(x), t))(
            xi, T_cur
        )
        T_new = jax.vmap(se3.orthonormalize)(T_new)
        return T_new

    T_out = jax.lax.fori_loop(0, iters, body, T0)
    cost = jnp.sum(
        _edge_residuals(T_out, e_i, e_j, T_meas_inv, w_sqrt) ** 2
    )
    return T_out, cost


def _ladder(n: int, floor: int, factor: int = 4) -> int:
    cap = floor
    while cap < n:
        cap *= factor
    return cap


def optimize_pose_graph_np(
    T_nodes: np.ndarray,
    fixed: np.ndarray,
    e_i: np.ndarray,
    e_j: np.ndarray,
    T_meas: np.ndarray,
    e_weight: np.ndarray | None = None,
    iters: int = 15,
):
    """Host wrapper: pad nodes/edges to coarse capacity ladders (one
    executable per rung, utils/buckets.py rationale) and run the jitted
    program; returns the optimized [N,4,4] poses."""
    n, e = len(T_nodes), len(e_i)
    ncap = _ladder(n, 16)
    ecap = _ladder(max(e, 1), 128)
    T_pad = np.tile(np.eye(4, dtype=np.float32), (ncap, 1, 1))
    T_pad[:n] = np.asarray(T_nodes, np.float32)
    fx = np.ones(ncap, bool)
    fx[:n] = np.asarray(fixed, bool)
    ei = np.zeros(ecap, np.int32)
    ej = np.zeros(ecap, np.int32)
    ei[:e] = np.asarray(e_i, np.int32)
    ej[:e] = np.asarray(e_j, np.int32)
    Tm = np.tile(np.eye(4, dtype=np.float32), (ecap, 1, 1))
    Tm[:e] = np.asarray(T_meas, np.float32)
    ev = np.zeros(ecap, bool)
    ev[:e] = True
    ew = np.ones(ecap, np.float32)
    if e_weight is not None:
        ew[:e] = np.asarray(e_weight, np.float32)
    T_out, _ = optimize_pose_graph(
        jnp.asarray(T_pad), jnp.asarray(fx), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(Tm), jnp.asarray(ev), jnp.asarray(ew), iters=iters,
    )
    out = np.asarray(T_out)[:n]
    if not np.isfinite(out).all():
        # never hand a non-finite correction back to the caller; keep the
        # inputs for diagnosis (a degenerate graph must degrade to "no
        # correction", not scramble the map)
        try:
            np.savez(
                "/tmp/pose_graph_nonfinite.npz",
                T=T_pad, fixed=fx, e_i=ei, e_j=ej, T_meas=Tm,
                e_valid=ev, e_w=ew,
            )
        except OSError:
            pass
        return None
    return out
