"""Fused steady-state tracking: the per-frame hot path as device programs.

The reference's per-frame superloop (System.cc:63-75 -> Tracking.cc:102-217)
is a chain of small stages. Run naively against a remote TPU, each stage is a
separate dispatch + readback, and the relay round-trip (~27 ms each, ~10 per
frame) dominates wall time. This module fuses the steady-state OK-path into
fixed-shape jitted programs with ONE packed readback each:

  * `motion_step`  — ORB extraction on the new image + Hamming match against
    the last frame + exact-pixel association against the last frame's
    keypoint map + motion-only pose LM
    (TrackWithMotionModel, Tracking.cc:434-485, minus host bookkeeping);
  * `local_step`   — frustum visibility over the local-map candidates +
    batched matching against every ACTIVE local keyframe + first-wins
    association + pose LM over the union
    (TrackLocalMap/SearchLocalPoints, Tracking.cc:487-633);
  * `steady_step`  — BOTH of the above as ONE program with ONE readback
    (opt-in `fusedOneStep`): candidate filtering (a map point is a candidate
    iff this frame's motion matches did not see it) moves on device, and the
    local-keyframe window is the one computed after the PREVIOUS frame (one
    frame stale; refreshed on the host right after the readback).

Host bookkeeping (KeyPointMap writes, MapPoint counters, state decisions,
keyframe creation) replays the returned association tables, preserving the
reference semantics: per-pixel last-writer-wins for motion associations
(KeyPointMap::SetMapPoint overwrite), first-wins + existing-blocks for
local-map associations (the `mp1 is None` check at Tracking.cc:620-631),
outlier purge between the two optimizations, and the inactive-keyframe skip
(targets need a frustum-visible candidate, Tracking.cc:600-609).

Map state rides each call as small padded uploads (positions/normals of the
referenced map points only) — uploads overlap the dispatch, so the per-frame
cost is one or two round trips instead of ten. Every host-bound output is
packed into ONE f32 array per program because each device->host buffer is a
separate relay round trip. Enabled by `SlamParameters.fusedTracking` (+
`fusedOneStep`); the unfused path remains the reference twin and the fused
paths are pinned against it by tests/test_fused.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mono_slam_framework_tpu.ops import hamming, orb
from mono_slam_framework_tpu.optim.pose_opt import pose_optimize

NONE = jnp.int32(-1)


def _pow2(n: int, floor: int = 64) -> int:
    n = max(int(n), floor)
    return 1 << (n - 1).bit_length()


def _f32(x):
    return jnp.asarray(x, jnp.float32).ravel()


def _motion_core(
    img, prev_feats, prev_px, prev_row, mp_pos, T_init, K, ratio, cols,
    use_octave_info, max_features, fast_threshold,
):
    """Extract + match-vs-last + exact-pixel associate + pose LM."""
    cur = orb.extract(img, max_features, fast_threshold)
    return _motion_core_feats(
        cur, prev_feats, prev_px, prev_row, mp_pos, T_init, K, ratio, cols,
        use_octave_info,
    )


def _motion_core_feats(
    cur, prev_feats, prev_px, prev_row, mp_pos, T_init, K, ratio, cols,
    use_octave_info, use_pallas_lm=None,
):
    """Match-vs-last + exact-pixel associate + pose LM on extracted features
    (the post-extraction half of `_motion_core`; pure XLA when
    `use_pallas_lm=False`, which the vmapped multi-stream path pins)."""
    d = hamming.distance_matrix(cur.desc, prev_feats.desc, cur.valid, prev_feats.valid)
    idx2, ok = hamming.knn2_ratio_match(d, ratio)
    ok = ok & cur.valid

    # exact-pixel association through the LAST frame's keypoint map
    # (featurematcher int truncation + KeyPointMap index = y*cols+x, B1)
    prev_xy = prev_feats.xy[idx2].astype(jnp.int32)
    prev_idx = prev_xy[:, 1] * cols + prev_xy[:, 0]
    eq = (prev_idx[:, None] == prev_px[None, :]) & (prev_row[None, :] >= 0)  # [K,M]
    hit = eq.any(axis=1)
    row = jnp.where(ok & hit, prev_row[jnp.argmax(eq, axis=1)], NONE)

    # per-CURRENT-pixel dedup, last writer wins (SetMapPoint overwrite while
    # the host loop walks matches in order, Tracking.cc:389-399)
    cur_xy = cur.xy.astype(jnp.int32)
    cur_idx = cur_xy[:, 1] * cols + cur_xy[:, 0]
    k = cur_idx.shape[0]
    ar = jnp.arange(k)
    later_same = (
        (cur_idx[None, :] == cur_idx[:, None])
        & (row[None, :] >= 0)
        & (ar[None, :] > ar[:, None])
    )
    keep = (row >= 0) & ~later_same.any(axis=1)

    Xw = mp_pos[jnp.clip(row, 0)]
    info = jnp.where(
        use_octave_info, 1.2 ** (-2.0 * cur.octave.astype(jnp.float32)), 1.0
    )
    T1, inlier, n_good = pose_optimize(
        T_init, Xw, cur.xy, keep, K, info, use_pallas=use_pallas_lm
    )
    return cur, T1, row, keep, inlier, n_good, idx2, ok


def _motion_pack(cur, T1, row, keep, inlier, n_good, idx2, ok):
    """Motion outputs as one f32 array: T1 (16), n_good (1), n_matches (1),
    then K-blocks row/keep/inlier/idx2/ok/xy_x/xy_y/octave. int->f32 is
    exact below 2^24 (rows/indices are far smaller)."""
    return jnp.concatenate(
        [
            _f32(T1),  # 16
            _f32(n_good),  # 1
            _f32(jnp.sum(ok.astype(jnp.int32))),  # 1
            _f32(row), _f32(keep), _f32(inlier), _f32(idx2), _f32(ok),  # 5K
            _f32(cur.xy[:, 0]), _f32(cur.xy[:, 1]), _f32(cur.octave),  # 3K
        ]
    )


def _frustum(pos, normal, maxdist, T, K, width, height):
    """Vectorized Frame::isInFrustum (Frame.cc:48-84) -> bool [C]."""
    R = T[:3, :3]
    t = T[:3, 3]
    Xc = pos @ R.T + t
    z_ok = Xc[:, 2] >= 0.0
    zs = jnp.where(Xc[:, 2] == 0, 1.0, Xc[:, 2])
    u = K[0, 0] * Xc[:, 0] / zs + K[0, 2]
    v = K[1, 1] * Xc[:, 1] / zs + K[1, 2]
    in_img = (u >= 0.0) & (u <= width) & (v >= 0.0) & (v <= height)
    Ow = -R.T @ t
    PO = pos - Ow
    dist = jnp.linalg.norm(PO, axis=-1)
    safe = jnp.where(dist == 0, 1.0, dist)
    cos_ok = jnp.sum(PO * normal, axis=-1) / safe >= 0.5
    return z_ok & in_img & (dist <= maxdist) & cos_ok


def _local_core(
    cur_feats, cur_row, T1, kf_feats, kf_px, kf_row, kf_active, mp_pos, K,
    ratio, cols, use_octave_info, use_pallas_lm=None,
):
    """Batched local-KF matching + first-wins association + pose LM."""
    def match_one(f2, px2, row2):
        d = hamming.distance_matrix(
            cur_feats.desc, f2.desc, cur_feats.valid, f2.valid
        )
        idx2, ok = hamming.knn2_ratio_match(d, ratio)
        ok = ok & cur_feats.valid
        kf_xy = f2.xy[idx2].astype(jnp.int32)
        kf_idx = kf_xy[:, 1] * cols + kf_xy[:, 0]
        eq = (kf_idx[:, None] == px2[None, :]) & (row2[None, :] >= 0)
        hit = eq.any(axis=1)
        return jnp.where(ok & hit, row2[jnp.argmax(eq, axis=1)], NONE)

    rows_nk = jax.vmap(match_one)(kf_feats, kf_px, kf_row)  # [N,K]
    rows_nk = jnp.where(kf_active[:, None], rows_nk, NONE)

    # merge: existing association blocks (the mp1-is-None check at
    # Tracking.cc:620-631); among new proposals the host walks results in
    # (keyframe, row) order and the first SetMapPoint wins the pixel
    first_kf = jnp.argmax(rows_nk >= 0, axis=0)  # [K]
    any_new = (rows_nk >= 0).any(axis=0)
    proposed = rows_nk[first_kf, jnp.arange(rows_nk.shape[1])]
    # the same current PIXEL may already be associated via another slot
    cur_xy = cur_feats.xy.astype(jnp.int32)
    cur_idx = cur_xy[:, 1] * cols + cur_xy[:, 0]
    k = cur_idx.shape[0]
    ar = jnp.arange(k)
    pixel_taken = (
        (cur_idx[None, :] == cur_idx[:, None]) & (cur_row[None, :] >= 0)
    ).any(axis=1)
    new_row = jnp.where(any_new & (cur_row < 0) & ~pixel_taken, proposed, NONE)
    # first-wins among new rows sharing a pixel, in the host's (kf, row)
    # processing order
    order = first_kf.astype(jnp.int32) * (k + 1) + ar
    earlier_new = (
        (cur_idx[None, :] == cur_idx[:, None])
        & (new_row[None, :] >= 0)
        & (order[None, :] < order[:, None])
    )
    new_row = jnp.where(earlier_new.any(axis=1), NONE, new_row)

    union_row = jnp.where(cur_row >= 0, cur_row, new_row)
    valid = union_row >= 0
    Xw = mp_pos[jnp.clip(union_row, 0)]
    info = jnp.where(
        use_octave_info, 1.2 ** (-2.0 * cur_feats.octave.astype(jnp.float32)), 1.0
    )
    T2, inlier, n_good = pose_optimize(
        T1, Xw, cur_feats.xy, valid, K, info, use_pallas=use_pallas_lm
    )
    return T2, new_row, inlier, n_good


@functools.partial(jax.jit, static_argnames=("max_features", "fast_threshold"))
def motion_step(
    img,
    prev_feats: orb.Features,
    prev_px,  # i32 [M] pixel index (y*cols+x) of last-frame associations
    prev_row,  # i32 [M] row into mp_pos (-1 = padding)
    mp_pos,  # f32 [P,3]
    T_init,
    K,
    ratio,
    cols: jnp.int32,
    use_octave_info,
    max_features: int,
    fast_threshold: float,
):
    """Extract + match-vs-last + associate + pose LM, one program.

    Returns (cur_feats, T1, packed) — packed is ONE f32 array in the
    `_motion_pack` layout. The association row is the mp row per current
    feature slot after exact-pixel lookup and per-pixel last-writer dedup.
    """
    cur, T1, row, keep, inlier, n_good, idx2, ok = _motion_core(
        img, prev_feats, prev_px, prev_row, mp_pos, T_init, K, ratio, cols,
        use_octave_info, max_features, fast_threshold,
    )
    return cur, T1, _motion_pack(cur, T1, row, keep, inlier, n_good, idx2, ok)


@jax.jit
def local_step(
    cur_feats: orb.Features,
    cur_row,  # i32 [K] mp row per slot from the motion step (inliers only)
    T1,
    kf_feats: orb.Features,  # stacked [N, ...]
    kf_px,  # i32 [N,M] pixel index of each keyframe's associations
    kf_row,  # i32 [N,M] mp row (-1 = padding)
    cand_mask,  # bool [R] ctx rows NOT seen by this frame's motion matches
    first_slot,  # i32 [R] first KF slot proposing each ctx row (-1 pad)
    ctx_normal,  # f32 [R,3] viewing normals over ctx rows
    ctx_maxdist,  # f32 [R]
    mp_pos,  # f32 [P,3] (P >= R; rows past R are per-frame extensions)
    T_for_frustum,
    K,
    ratio,
    cols: jnp.int32,
    width: jnp.float32,
    height: jnp.float32,
    use_octave_info=True,
):
    """Frustum + batched local-KF matching + association + pose LM.

    Candidates live in the cached ctx ROW space (shapes keyed to rcap, which
    only changes on keyframe events) instead of a per-frame compacted
    candidate array — per-frame candidate-count shape churn recompiled this
    program every few frames (VERDICT round-2 weak #3). The host supplies
    `cand_mask` (the last_frame_seen filter, Tracking.cc:577-599).

    Returns ONE packed f32 array: T2 (16), n_inliers (1), new_row (K),
    inlier (K), vis (R). new_row is the mp row newly associated per current
    slot (-1 none); inlier flags cover the union of old + new associations
    per slot.
    """
    R = first_slot.shape[0]
    vis = (
        _frustum(mp_pos[:R], ctx_normal, ctx_maxdist, T_for_frustum, K, width, height)
        & (first_slot >= 0)
        & cand_mask
    )
    # a keyframe is matched only if it proposed a visible candidate
    # (n_to_match > 0 gate, Tracking.cc:600-609 / tracking.py targets)
    n_kf = kf_px.shape[0]
    kf_active = jax.ops.segment_max(
        vis.astype(jnp.int32), jnp.clip(first_slot, 0), n_kf
    ) > 0
    # NOTE: proposals from the kf tables are deliberately NOT restricted to
    # visible candidates — the unfused SearchLocalPoints matches whole
    # keyframes and associates ANY of their map points (Tracking.cc:620-631);
    # vis only gates which keyframes are matched and the visible counters.

    T2, new_row, inlier, n_good = _local_core(
        cur_feats, cur_row, T1, kf_feats, kf_px, kf_row, kf_active, mp_pos,
        K, ratio, cols, use_octave_info,
    )
    return jnp.concatenate(
        [_f32(T2), _f32(n_good), _f32(new_row), _f32(inlier), _f32(vis)]
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "ratio", "cols", "width", "height", "use_octave_info",
        "max_features", "fast_threshold",
    ),
)
def steady_step(
    img,  # [H,W] f32 (or u8; cast on device — the upload is 4x smaller)
    prev_feats: orb.Features,
    prev_px,  # i32 [M] pixel index of last-frame associations
    prev_row,  # i32 [M] row into mp_pos (-1 = padding)
    mp_pos,  # f32 [P,3] positions over ctx rows + per-frame extensions
    T_init,
    kf_feats: orb.Features,  # stacked [N, ...] local-KF context (cached)
    kf_px,  # i32 [N,M2]
    kf_row,  # i32 [N,M2] rows into mp_pos
    first_slot,  # i32 [R] first KF slot proposing each ctx row (-1 pad)
    ctx_normal,  # f32 [R,3] viewing normals over ctx rows
    ctx_maxdist,  # f32 [R]
    K,
    ratio: float,
    cols: int,
    width: float,
    height: float,
    use_octave_info: bool,
    max_features: int,
    fast_threshold: float,
):
    """Motion + local tracking as ONE program with ONE packed readback.

    Candidate filtering happens on device: a ctx row is a candidate iff no
    motion match saw it this frame (the device twin of the last_frame_seen
    stamp walk, Tracking.cc:577-599). The local-KF window (kf_* tables) is
    the one computed after the previous frame — one frame stale, refreshed
    on the host after the readback.

    Packed layout: T1 (16), n_good1 (1), n_matches (1), then K-blocks
    row/keep/inlier1/idx2/ok/xy_x/xy_y/octave, then T2 (16), n_good2 (1),
    new_row (K), inlier2 (K), vis (R).
    """
    img = jnp.asarray(img, jnp.float32)
    cur = orb.extract(img, max_features, fast_threshold)
    return _steady_core(
        cur, prev_feats, prev_px, prev_row, mp_pos, T_init, kf_feats, kf_px,
        kf_row, first_slot, ctx_normal, ctx_maxdist, K, ratio, cols, width,
        height, use_octave_info,
    )


def _steady_core(
    cur, prev_feats, prev_px, prev_row, mp_pos, T_init, kf_feats, kf_px,
    kf_row, first_slot, ctx_normal, ctx_maxdist, K, ratio, cols, width,
    height, use_octave_info, use_pallas_lm=None,
):
    """The post-extraction body of `steady_step` (motion association + local
    phase + packing) on already-extracted features. Pure XLA when
    `use_pallas_lm=False`, so it vmaps over a leading stream axis — the
    multi-stream serving path (parallel/multistream.py)."""
    cur, T1, row, keep, inlier, n_good, idx2, ok = _motion_core_feats(
        cur, prev_feats, prev_px, prev_row, mp_pos, T_init, K, ratio, cols,
        use_octave_info, use_pallas_lm,
    )

    # inliers carry into the local phase (the host replay drops outliers
    # before SearchLocalPoints; same rule here)
    cur_row = jnp.where(keep & inlier, row, NONE)

    # device twin of the last_frame_seen stamps: every row a motion match
    # touched (inlier via SetMapPoint + the seen loop, outlier via the
    # direct stamp) is excluded from the candidate set
    P = mp_pos.shape[0]
    seen = jnp.zeros(P, bool).at[jnp.clip(row, 0)].max(keep)

    R = first_slot.shape[0]
    vis = (
        _frustum(mp_pos[:R], ctx_normal, ctx_maxdist, T1, K, width, height)
        & (first_slot >= 0)
        & ~seen[:R]
    )
    n_kf = kf_px.shape[0]
    kf_active = jax.ops.segment_max(
        vis.astype(jnp.int32), jnp.clip(first_slot, 0), n_kf
    ) > 0

    T2, new_row, inlier2, n_good2 = _local_core(
        cur, cur_row, T1, kf_feats, kf_px, kf_row, kf_active, mp_pos,
        K, ratio, cols, use_octave_info, use_pallas_lm,
    )

    packed = jnp.concatenate(
        [
            _motion_pack(cur, T1, row, keep, inlier, n_good, idx2, ok),
            _f32(T2), _f32(n_good2), _f32(new_row), _f32(inlier2), _f32(vis),
        ]
    )

    # device-resident chain state for speculative next-frame dispatch
    # (fused_host.dispatch_steady_spec): this frame's final associations as
    # next-frame prev tables, plus the optimized pose. Never transferred in
    # the non-pipelined mode — zero cost there.
    cur_xy_i = cur.xy.astype(jnp.int32)
    cur_idx = cur_xy_i[:, 1] * cols + cur_xy_i[:, 0]
    union_row = jnp.where(cur_row >= 0, cur_row, new_row)
    chain_px = jnp.where(union_row >= 0, cur_idx, NONE)
    return cur, packed, chain_px, union_row, T2


@jax.jit
def chain_T_init(T_prev, T_prev2):
    """Device twin of the host motion model for speculative dispatch:
    T_init = velocity @ T_prev with velocity = T_prev @ inv(T_prev2)
    (Tracking.cc:155-165; inv is the exact SE3 inverse)."""
    R = T_prev2[:3, :3]
    t = T_prev2[:3, 3]
    inv = jnp.eye(4, dtype=jnp.float32)
    inv = inv.at[:3, :3].set(R.T).at[:3, 3].set(-R.T @ t)
    return T_prev @ inv @ T_prev
