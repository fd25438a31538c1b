"""Fused steady-state tracking for the DNN (LoFTR) matcher.

The ORB fast path (slam/fused_tracking.py + fused_host.py) fuses the
per-frame OK-state superloop into ONE device program with ONE packed
readback. This module gives the LoFTR matcher the same treatment — without
it the DNN configuration runs the unfused flow (~10 relay round trips per
frame plus an eager backbone pass per pairwise match).

LoFTR frames have a natural fixed-shape "keypoint" set: the L = 30x40 = 1200
coarse cells of the /16 feature grid (dnnfeaturematcher.cpp:75-100 decode).
A frame's association state is therefore a dense [L] row table (map-point
row per cell, -1 = none) instead of the ORB path's padded sparse tables, and
per-pixel dedup is free (distinct cells decode to distinct pixels).

`steady_step_loftr` is one program:
  encode (backbone+posenc, ~50 convs)             — models/loftr_native.py
  -> pairwise transformer + dual-softmax vs last frame (argmax per cur cell)
  -> cell-table association + motion pose LM      (TrackWithMotionModel twin)
  -> device candidate filter (frustum + not-seen) (SearchLocalPoints twin)
  -> lax.map'd transformer vs each local keyframe, first-KF-wins merge
  -> pose LM over the union                       (TrackLocalMap twin)
with all host-bound outputs packed into ONE f32 array. The local-keyframe
window is the one computed after the PREVIOUS frame (one frame stale,
refreshed post-readback) — the same deliberate deviation as the ORB
one-step path. The coarse-cell (fine=False) measurement model is used on
device; the matcher's effective sigma rides in as a constant InvSigma2.

Host bookkeeping replays the returned tables with the unfused semantics
(slam/tracking.py::track_with_motion_model + track_local_map). Falls back to
the unfused reference-twin flow (returning None) whenever preconditions
fail.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mono_slam_framework_tpu.matchers.base import MatchFramesResult
from mono_slam_framework_tpu.models import loftr_native
from mono_slam_framework_tpu.optim.pose_opt import pose_optimize
from mono_slam_framework_tpu.slam.fused_tracking import _frustum

NONE = jnp.int32(-1)


def _pow2(n: int, floor: int = 64) -> int:
    n = max(int(n), floor)
    return 1 << (n - 1).bit_length()


def _f32(x):
    return jnp.asarray(x, jnp.float32).ravel()


# ---------------------------------------------------------------------------
# device program
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("threshold", "width", "height", "resize_hw"),
)
def steady_step_loftr(
    img,  # [H,W] f32 grayscale (native size; resized on device if needed)
    params,  # LoFTR weight dict (device-resident)
    f_prev,  # [1,L,C] last frame's encoded features (cached)
    prev_cellrow,  # i32 [L] map-point row per LAST-frame cell (-1 none)
    mp_pos,  # f32 [P,3] positions over ctx rows + extensions
    T_init,  # f32 [4,4] velocity-model initial pose
    kf_feats,  # f32 [N,L,C] stacked local-KF features (cached ctx)
    kf_cellrow,  # i32 [N,L] map-point row per KF cell (-1 none)
    first_slot,  # i32 [R] first KF slot proposing each ctx row (-1 pad)
    ctx_normal,  # f32 [R,3]
    ctx_maxdist,  # f32 [R]
    cell_uv,  # f32 [L,2] image-pixel coords of each cell corner
    K,  # f32 [3,3]
    info_val,  # f32 scalar InvSigma2 of the coarse-cell measurement
    threshold: float,
    width: float,
    height: float,
    resize_hw: tuple | None,
):
    """One-program LoFTR steady frame. Returns
    (f_cur, packed, union_row, T2): the last two stay device-resident as
    the chain for the NEXT frame's speculative dispatch — union_row is the
    final per-cell association row table, exactly the prev_cellrow the next
    steady frame would rebuild on host (fused_host's chain contract).

    Packed layout: T1 (16), n_good1 (1), n_matches (1), then L-blocks
    row/okm/inlier1/j1, then T2 (16), n_good2 (1), new_row (L), inlier2 (L),
    vis (R).
    """
    x = jnp.asarray(img, jnp.float32)
    if resize_hw is not None:
        x = jax.image.resize(x, resize_hw, "bilinear")
    f_cur = loftr_native.encode(params, (x / 255.0)[None, None])
    return _loftr_core(
        f_cur, params, f_prev, prev_cellrow, mp_pos, T_init, kf_feats,
        kf_cellrow, first_slot, ctx_normal, ctx_maxdist, cell_uv, K,
        info_val, threshold, width, height,
    )


def _loftr_core(
    f_cur, params, f_prev, prev_cellrow, mp_pos, T_init, kf_feats,
    kf_cellrow, first_slot, ctx_normal, ctx_maxdist, cell_uv, K,
    info_val, threshold, width, height, use_pallas_lm=None,
):
    """The post-encode body of `steady_step_loftr` on already-encoded
    features. Pure XLA when `use_pallas_lm=False`, so it vmaps over a
    leading stream axis — the multi-stream LoFTR serving path
    (parallel/multistream.py)."""
    L = f_cur.shape[1]

    # ---- motion phase: match vs last frame -------------------------------
    conf = loftr_native.confidence_from_features(params, f_cur, f_prev)[0]
    j1 = jnp.argmax(conf, axis=1)  # best prev cell per cur cell [L]
    v1 = jnp.take_along_axis(conf, j1[:, None], axis=1)[:, 0]
    okm = v1 > threshold
    row = jnp.where(okm, prev_cellrow[j1], NONE)
    keep = row >= 0
    n_matches = jnp.sum(okm.astype(jnp.int32))

    info = jnp.full((L,), info_val, jnp.float32)
    Xw = mp_pos[jnp.clip(row, 0)]
    T1, inlier1, n_good1 = pose_optimize(
        T_init, Xw, cell_uv, keep, K, info, use_pallas=use_pallas_lm
    )

    # ---- candidate filter (device twin of last_frame_seen stamps) --------
    P = mp_pos.shape[0]
    seen = jnp.zeros(P, bool).at[jnp.clip(row, 0)].max(keep)
    R = first_slot.shape[0]
    vis = (
        _frustum(mp_pos[:R], ctx_normal, ctx_maxdist, T1, K, width, height)
        & (first_slot >= 0)
        & ~seen[:R]
    )
    n_kf = kf_feats.shape[0]
    kf_active = jax.ops.segment_max(
        vis.astype(jnp.int32), jnp.clip(first_slot, 0), n_kf
    ) > 0

    # ---- local phase: match vs each local keyframe -----------------------
    # lax.map keeps peak memory at one [L,L] confidence matrix instead of
    # materializing all N at once (N x 5.7 MB would blow VMEM-friendly
    # fusion for large windows)
    def one_kf(args):
        f_kf, cellrow_kf, active = args
        c = loftr_native.confidence_from_features(params, f_cur, f_kf[None])[0]
        j = jnp.argmax(c, axis=1)
        v = jnp.take_along_axis(c, j[:, None], axis=1)[:, 0]
        # proposals are NOT restricted to visible candidates — the unfused
        # SearchLocalPoints associates ANY map point of a matched keyframe
        # (Tracking.cc:620-631); vis only gates which KFs are matched
        return jnp.where((v > threshold) & active, cellrow_kf[j], NONE)

    rows_nk = jax.lax.map(one_kf, (kf_feats, kf_cellrow, kf_active))  # [N,L]

    cur_row = jnp.where(keep & inlier1, row, NONE)
    first_kf = jnp.argmax(rows_nk >= 0, axis=0)
    any_new = (rows_nk >= 0).any(axis=0)
    proposed = rows_nk[first_kf, jnp.arange(L)]
    new_row = jnp.where(any_new & (cur_row < 0), proposed, NONE)

    union_row = jnp.where(cur_row >= 0, cur_row, new_row)
    T2, inlier2, n_good2 = pose_optimize(
        T1, mp_pos[jnp.clip(union_row, 0)], cell_uv, union_row >= 0, K,
        info, use_pallas=use_pallas_lm
    )

    packed = jnp.concatenate(
        [
            _f32(T1), _f32(n_good1), _f32(n_matches),
            _f32(row), _f32(okm), _f32(inlier1), _f32(j1),
            _f32(T2), _f32(n_good2), _f32(new_row), _f32(inlier2), _f32(vis),
        ]
    )
    return f_cur, packed, union_row, T2


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------


def applicable(tracker) -> bool:
    """Fused-LoFTR preconditions: steady OK-state motion-model tracking with
    the LoFTR matcher in its coarse (fine=False) configuration."""
    from mono_slam_framework_tpu.matchers.loftr_matcher import (
        LoftrFeatureMatcher,
    )

    return (
        getattr(tracker.params, "fusedTracking", False)
        and getattr(tracker.params, "fusedOneStep", False)
        and isinstance(tracker.matcher, LoftrFeatureMatcher)
        and not tracker.matcher.fine
        and tracker.velocity is not None
        and tracker.current_frame.id >= tracker.last_reloc_frame_id + 2
    )


def _cell_tables(tracker, m):
    """Static per-resolution cell decode tables: flat pixel index and float
    pixel coords of every coarse cell corner (matcher decode contract)."""
    from mono_slam_framework_tpu.matchers import loftr_matcher as lm

    h = tracker.img_height
    w = tracker.img_width
    cols = tracker.current_frame.keypoint_map.cols
    key = (h, w, cols)
    cached = getattr(tracker, "_loftr_cell_tables", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    sx = cols / lm.MODEL_W
    sy = tracker.current_frame.keypoint_map.rows / lm.MODEL_H
    cells = np.arange(lm.L)
    x = ((cells % lm.GRID_W) * lm.CELL * sx).astype(np.int32)
    y = ((cells // lm.GRID_W) * lm.CELL * sy).astype(np.int32)
    tables = {
        "pix": x + y * cols,  # i32 [L] flat pixel index per cell
        "uv": jnp.asarray(np.stack([x, y], -1).astype(np.float32)),
        "uv_host": np.stack([x, y], -1).astype(np.float32),
        "cell_of_pix": {int(p): int(c) for c, p in enumerate(x + y * cols)},
        "scale": (sx, sy),
    }
    tracker._loftr_cell_tables = (key, tables)
    return tables


def _ensure_ctx(tracker, m, tables) -> dict:
    """Local-map device context for the LoFTR path: stacked KF features +
    dense per-cell row tables + row-space geometry. Rebuilt only when the
    local-KF set, any member's KeyPointMap version, or the map's geometry
    epoch changes (same invalidation contract as fused_host._ensure_ctx)."""
    local_kfs = sorted(tracker.local_keyframes, key=lambda kf: kf.id)
    n_kf = len(local_kfs)
    ckey = (
        tuple(kf.id for kf in local_kfs),
        tuple(kf.keypoint_map.version for kf in local_kfs),
        tracker.map.geometry_epoch,
    )
    ctx = getattr(tracker, "_loftr_lm_ctx", None)
    if ctx is not None and ctx["key"] == ckey and not any(
        mp.is_bad for mp in ctx["mps"]
    ):
        return ctx

    from mono_slam_framework_tpu.matchers import loftr_matcher as lm

    nkcap = _pow2(n_kf, floor=4)
    kfs = local_kfs + [local_kfs[0]] * (nkcap - n_kf)
    cell_of_pix = tables["cell_of_pix"]

    row_of: dict = {}
    mps: list = []
    kf_cellrow = np.full((nkcap, lm.L), -1, np.int32)
    first_slot_of: dict = {}
    for kslot in range(n_kf):
        kf = kfs[kslot]
        for pix, item in kf.keypoint_map.items():
            mp = item.map_point
            if mp is None or mp.is_bad:
                continue
            cell = cell_of_pix.get(pix)
            if cell is None:
                continue  # association not on the cell lattice (reloc/ORB-era)
            r = row_of.get(id(mp))
            if r is None:
                r = len(mps)
                row_of[id(mp)] = r
                mps.append(mp)
                first_slot_of[r] = kslot
            kf_cellrow[kslot, cell] = r

    from mono_slam_framework_tpu.utils.buckets import ladder_cap

    nrows = len(mps)
    rcap = ladder_cap(nrows, 256)
    first_slot = np.full(rcap, -1, np.int32)
    pos = np.zeros((nrows, 3), np.float32)
    nrm = np.zeros((rcap, 3), np.float32)
    maxd = np.zeros(rcap, np.float32)
    for r, mp in enumerate(mps):
        first_slot[r] = first_slot_of[r]
        pos[r] = mp.world_pos
        nrm[r] = mp.normal
        maxd[r] = mp.distance_invariance()

    stack_key = tuple(kf.id for kf in kfs)
    stack_cache = getattr(tracker, "_loftr_stack_cache", None)
    if stack_cache is not None and stack_cache[0] == stack_key:
        kf_feats = stack_cache[1]
    else:
        kf_feats = jnp.concatenate([m._features(kf)[0] for kf in kfs], axis=0)
        tracker._loftr_stack_cache = (stack_key, kf_feats)

    # device-resident position table over the rcap row space: ext-free
    # steady frames (the common case) reuse it instead of rebuilding and
    # re-uploading mp_pos every frame
    pos_pad = np.zeros((rcap, 3), np.float32)
    pos_pad[:nrows] = pos
    ctx = {
        "key": ckey,
        "n_kf": n_kf,
        "rcap": rcap,
        "row_of": row_of,
        "mps": mps,
        "pos": pos,
        "kf_feats": kf_feats,
        "kf_cellrow": jnp.asarray(kf_cellrow),
        "first_slot_d": jnp.asarray(first_slot),
        "normal_d": jnp.asarray(nrm),
        "maxdist_d": jnp.asarray(maxd),
        "mp_pos_d": jnp.asarray(pos_pad),
    }
    tracker._loftr_lm_ctx = ctx
    return ctx


def run_steady(tracker) -> bool | None:
    """One-program LoFTR steady frame. Returns final tracking ok, or None to
    fall back to the unfused reference-twin flow.

    Mirrors fused_host.run_steady's speculative-dispatch contract: a spec
    dispatched by `dispatch_steady_spec` (pipelined mode) or SlamServer's
    batched group is consumed here after revalidation."""
    from mono_slam_framework_tpu.matchers import loftr_matcher as lm
    from mono_slam_framework_tpu.slam.fused_host import _count

    m = tracker.matcher
    cur = tracker.current_frame
    if not tracker.local_keyframes:
        return None

    tables = _cell_tables(tracker, m)

    # speculative-dispatch consumption (see fused_host.run_steady)
    spec = getattr(tracker, "_pipe_spec", None)
    tracker._pipe_spec = None
    if spec is not None and spec.get("kind") != "loftr":
        spec = None
    if spec is not None:
        ctx = _ensure_ctx(tracker, m, tables)
        if spec["prev_frame_id"] != tracker.last_frame.id:
            _count(tracker, "miss_frame")
            spec = None
        elif spec["ctx"] is not ctx:
            _count(tracker, "miss_ctx")
            spec = None
        elif tracker.last_frame.keypoint_map.version != 0:
            _count(tracker, "miss_version")
            spec = None
    if spec is not None:
        tracker.update_last_frame()
        cur.keypoint_map.clear()
        _count(tracker, "hit")
        return _replay_steady(
            tracker, m, cur, tables, ctx, spec["ext"],
            spec["f_cur"], spec["packed_d"], spec["chain"],
        )

    ctx = _ensure_ctx(tracker, m, tables)
    rcap = ctx["rcap"]
    nrows = len(ctx["mps"])

    tracker.update_last_frame()
    T_init = (tracker.velocity @ tracker.last_frame.Tcw).astype(np.float32)
    cur.keypoint_map.clear()

    f_prev, _scale = m._features(tracker.last_frame)

    # last-frame associations as a dense per-cell row table; points outside
    # the ctx row space get extension rows past rcap
    prev_cellrow = np.full(lm.L, -1, np.int32)
    ext: list = []
    ext_rows: dict = {}
    cell_of_pix = tables["cell_of_pix"]
    for pix, item in tracker.last_frame.keypoint_map.items():
        mp = item.map_point
        if mp is None:
            continue
        cell = cell_of_pix.get(pix)
        if cell is None:
            continue
        r = ctx["row_of"].get(id(mp))
        if r is None:
            r = ext_rows.get(id(mp))
            if r is None:
                r = rcap + len(ext)
                ext_rows[id(mp)] = r
                ext.append(mp)
        prev_cellrow[cell] = r

    mp_pos_d = _mp_pos_for(ctx, ext)

    h, w = np.asarray(cur.image).shape
    resize = None if (h, w) == (lm.MODEL_H, lm.MODEL_W) else (lm.MODEL_H, lm.MODEL_W)
    f_cur, packed_d, nrow_d, nT2_d = steady_step_loftr(
        jnp.asarray(cur.image, jnp.float32),
        m.params,
        f_prev,
        jnp.asarray(prev_cellrow),
        mp_pos_d,
        jnp.asarray(T_init),
        ctx["kf_feats"],
        ctx["kf_cellrow"],
        ctx["first_slot_d"],
        ctx["normal_d"],
        ctx["maxdist_d"],
        tables["uv"],
        jnp.asarray(tracker.K, jnp.float32),
        jnp.float32(1.2 ** (-2.0 * m._sigma_octave(tables["scale"]))
                    if tracker.octave_information else 1.0),
        float(m.threshold),
        float(tracker.img_width),
        float(tracker.img_height),
        resize,
    )
    return _replay_steady(
        tracker, m, cur, tables, ctx, ext, f_cur, packed_d, (nrow_d, nT2_d)
    )


def _mp_pos_for(ctx, ext):
    """Position table (ctx rows up front, extension rows past rcap) for a
    steady dispatch; ext-free frames reuse the cached device table."""
    if not ext:
        return ctx["mp_pos_d"]
    rcap = ctx["rcap"]
    nrows = len(ctx["mps"])
    pcap = _pow2(rcap + len(ext))
    mp_pos = np.zeros((pcap, 3), np.float32)
    mp_pos[:nrows] = ctx["pos"]
    for j, mp in enumerate(ext):
        mp_pos[rcap + j] = mp.world_pos
    return jnp.asarray(mp_pos)


def _replay_steady(
    tracker, m, cur, tables, ctx, ext, f_cur, packed_d, chain
) -> bool | None:
    """Readback + full host replay of a steady_step_loftr result (shared by
    the direct and speculative-dispatch paths). `packed_d` may be a device
    array or a zero-arg callable returning the host row (SlamServer's
    shared lazy batch fetch)."""
    from mono_slam_framework_tpu.matchers import loftr_matcher as lm

    rcap = ctx["rcap"]
    nrows = len(ctx["mps"])

    # seed the matcher cache so later stages reuse the encode (same LRU
    # bound as LoftrFeatureMatcher._features)
    key = m._frame_key(cur)
    m._feat_cache[key] = (f_cur, tables["scale"])
    if len(m._feat_cache) > m.cache_size:
        m._feat_cache.popitem(last=False)

    # THE one readback of the frame
    if callable(packed_d):
        p = np.asarray(packed_d())
    else:
        p = np.asarray(jax.device_get(packed_d))
    L = lm.L
    T1 = p[:16].reshape(4, 4)
    n_matches = int(p[17])
    blk = p[18 : 18 + 4 * L].reshape(4, L)
    row = blk[0].astype(np.int32)
    okm = blk[1] > 0.5
    inlier1 = blk[2] > 0.5
    j1 = blk[3].astype(np.int32)
    off = 18 + 4 * L
    T2 = p[off : off + 16].reshape(4, 4)
    new_row = p[off + 17 : off + 17 + L].astype(np.int32)
    inlier2 = p[off + 17 + L : off + 17 + 2 * L] > 0.5
    vis = p[off + 17 + 2 * L :] > 0.5

    # match image from the raw cell matches (CreateCurrentMatchImage, B6)
    uv_host = tables["uv_host"]
    res = MatchFramesResult(
        frame1=cur,
        frame2=tracker.last_frame,
        keypoints1=uv_host[okm].astype(np.int32),
        keypoints2=uv_host[j1[okm]].astype(np.int32),
    )
    tracker.create_current_match_image(res, has_mp=(row >= 0)[okm])

    if n_matches < tracker.min_local_match_count:
        tracker._loftr_chain = None
        return None  # too few raw matches -> host ref-KF path

    def mp_of_row(r: int):
        return ctx["mps"][r] if r < nrows else ext[r - rcap]

    info_v = (
        float(1.2 ** (-2.0 * m._sigma_octave(tables["scale"])))
        if tracker.octave_information
        else 1.0
    )
    pix_tab = tables["pix"]

    # motion association replay
    keep = row >= 0
    inl_c = np.nonzero(keep & inlier1)[0]
    out_c = np.nonzero(keep & ~inlier1)[0]
    for c in out_c:
        mp_of_row(row[c]).last_frame_seen = cur.id
    mps_in = [mp_of_row(r) for r in row[inl_c]]
    cur.keypoint_map.bulk_set_map_points(
        [int(pix_tab[c]) for c in inl_c],
        mps_in,
        [tuple(uv_host[c]) for c in inl_c],
        [info_v] * len(inl_c),
    )
    cell_of_pixel = {int(pix_tab[c]): int(c) for c in inl_c}
    n_matches_map = sum(1 for mp in mps_in if mp.n_obs > 0)
    cur.set_pose(T1)

    if n_matches_map < 10:
        tracker._loftr_chain = None
        return None  # motion-model failed -> host ref-KF path

    # visible/seen bookkeeping (Tracking.cc:577-588)
    to_remove = []
    for idx, item in cur.keypoint_map.items():
        mp = item.map_point
        if mp.is_bad:
            to_remove.append(idx)
        else:
            mp.increase_visible()
            mp.last_frame_seen = cur.id
    for idx in to_remove:
        cur.keypoint_map.set_map_point_by_index(idx, None)
    cell_of_pixel = {
        pix: c for pix, c in cell_of_pixel.items() if pix in cur.keypoint_map._items
    }

    # candidate marker parity + frustum-visible counters (Tracking.cc:589-616)
    for mp in ctx["mps"]:
        mp.track_reference_for_frame = cur.id
    for r in np.nonzero(vis[:nrows])[0]:
        ctx["mps"][r].increase_visible()

    # new associations (first-KF-wins resolved on device)
    ns = np.nonzero(new_row >= 0)[0]
    cur.keypoint_map.bulk_set_map_points(
        [int(pix_tab[c]) for c in ns],
        [ctx["mps"][r] for r in new_row[ns]],
        [tuple(uv_host[c]) for c in ns],
        [info_v] * len(ns),
    )
    cell_of_pixel.update((int(pix_tab[c]), int(c)) for c in ns)

    cur.set_pose(T2)

    # final inlier accounting (TrackLocalMap, Tracking.cc:497-516)
    tracker.n_matches_inliers = 0
    for pix, c in cell_of_pixel.items():
        item = cur.keypoint_map._items.get(pix)
        if item is None:
            continue
        item.outlier = not bool(inlier2[c])
        if not item.outlier:
            item.map_point.increase_found()
            if item.map_point.n_obs > 0:
                tracker.n_matches_inliers += 1

    # refresh the (one-frame-stale) window + reference KF
    tracker.update_local_keyframes()

    # device-resident chain for the NEXT frame's speculative dispatch: this
    # frame's final per-cell association table + pose stay on device
    ok_final = tracker.n_matches_inliers >= tracker.min_local_match_count
    if ok_final:
        tracker._loftr_chain = {
            "frame_id": cur.id,
            "ctx": ctx,
            "ext": ext,
            "chain": chain,  # (cellrow_d, T2_d)
            "T_prev_host": np.array(tracker.last_frame.Tcw, np.float32),
        }
    else:
        tracker._loftr_chain = None

    coeff = tracker.n_matches_inliers / max(tracker.min_local_match_count, 1)
    tracker._log(
        f"Tracking coefficient - {coeff}, if < 1.0 then tracking will be lost."
    )
    return ok_final


# ---------------------------------------------------------------------------
# speculative dispatch (pipelined mode + SlamServer batching)
# ---------------------------------------------------------------------------


def prepare_spec_inputs(tracker, image) -> dict | None:
    """Build (without dispatching) the device inputs for a speculative
    `steady_step_loftr` launch from the tracker's device-resident chain —
    the DNN-matcher twin of fused_host.prepare_spec_inputs, sharing its
    counters and its SlamServer batching contract (`key` groups identically
    shaped programs; "kind" separates the LoFTR program from ORB's).
    Returns None when the chain preconditions fail; performs no tracker
    mutation. Contract twin: dnnfeaturematcher.cpp:44-102 is a drop-in
    plugin, so the fast modes must be too (VERDICT r3 #3)."""
    from mono_slam_framework_tpu.matchers.loftr_matcher import (
        LoftrFeatureMatcher,
    )
    from mono_slam_framework_tpu.matchers import loftr_matcher as lm
    from mono_slam_framework_tpu.slam.fused_host import _count

    m = tracker.matcher
    ch = getattr(tracker, "_loftr_chain", None)
    if (
        ch is None
        or not getattr(tracker.params, "fusedOneStep", False)
        or not isinstance(m, LoftrFeatureMatcher)
        or m.fine
        or tracker.last_frame is None
        or ch["frame_id"] != tracker.last_frame.id
        or tracker.velocity is None
        or not tracker.local_keyframes
    ):
        _count(tracker, "skip_no_chain")
        return None
    tables = _cell_tables(tracker, m)
    ctx = _ensure_ctx(tracker, m, tables)
    if ctx is not ch["ctx"]:
        _count(tracker, "skip_ctx_changed")
        return None  # window/geometry changed; chain rows are stale
    ext = ch["ext"]

    img = np.asarray(image, np.float32)
    img_d = jax.device_put(img)
    f_prev, _scale = m._features(tracker.last_frame)
    cellrow_d, T2_d = ch["chain"]
    mp_pos_d = _mp_pos_for(ctx, ext)

    h, w = img.shape
    resize = (
        None if (h, w) == (lm.MODEL_H, lm.MODEL_W) else (lm.MODEL_H, lm.MODEL_W)
    )
    statics = {
        "threshold": float(m.threshold),
        "width": float(tracker.img_width),
        "height": float(tracker.img_height),
        "resize_hw": resize,
    }
    info_val = float(
        1.2 ** (-2.0 * m._sigma_octave(tables["scale"]))
        if tracker.octave_information
        else 1.0
    )
    return {
        "kind": "loftr",
        "img_d": img_d,
        "f_prev": f_prev,
        "cellrow_d": cellrow_d,
        "T2_d": T2_d,
        "T_prev_host": np.asarray(ch["T_prev_host"], np.float32),
        "mp_pos_d": mp_pos_d,
        "info_val": info_val,
        "tables": tables,
        "ctx": ctx,
        "ext": ext,
        "statics": statics,
        # full batching key: identical statics AND identical input shapes
        # mean the prepared frames can share one batched program
        "key": (
            "loftr",
            tuple(sorted(statics.items())),
            info_val,  # shared scalar in the batched program
            tuple(img_d.shape),
            int(mp_pos_d.shape[0]),
            ctx["rcap"],
            tuple(ctx["kf_feats"].shape),
        ),
    }


def finish_spec(tracker, prep, f_cur, packed_d, chain) -> dict:
    """Package a dispatched LoFTR steady program's handles as the spec
    consumed by run_steady's speculative branch. `packed_d` may be a device
    array (the async copy is started here) or a zero-arg callable
    (SlamServer's one-readback-per-tick lazy fetch)."""
    if hasattr(packed_d, "copy_to_host_async"):
        packed_d.copy_to_host_async()
    return {
        "kind": "loftr",
        "prev_frame_id": tracker.last_frame.id,
        "ctx": prep["ctx"],
        "ext": prep["ext"],
        "f_cur": f_cur,
        "packed_d": packed_d,
        "chain": chain,
    }


def dispatch_prepared(tracker, prep) -> dict:
    """Dispatch a single-stream speculative LoFTR steady program from an
    already prepared input set (`prepare_spec_inputs`)."""
    from mono_slam_framework_tpu.slam.fused_host import _count
    from mono_slam_framework_tpu.slam.fused_tracking import chain_T_init

    _count(tracker, "dispatch")
    m = tracker.matcher
    ctx = prep["ctx"]
    tables = prep["tables"]
    s = prep["statics"]
    T_init_d = chain_T_init(prep["T2_d"], jnp.asarray(prep["T_prev_host"]))
    f_cur, packed_d, nrow_d, nT2_d = steady_step_loftr(
        prep["img_d"],
        m.params,
        prep["f_prev"],
        prep["cellrow_d"],
        prep["mp_pos_d"],
        T_init_d,
        ctx["kf_feats"],
        ctx["kf_cellrow"],
        ctx["first_slot_d"],
        ctx["normal_d"],
        ctx["maxdist_d"],
        tables["uv"],
        jnp.asarray(tracker.K, jnp.float32),
        jnp.float32(prep["info_val"]),
        s["threshold"],
        s["width"],
        s["height"],
        s["resize_hw"],
    )
    return finish_spec(tracker, prep, f_cur, packed_d, (nrow_d, nT2_d))


def dispatch_steady_spec(tracker, image) -> dict | None:
    """Speculatively dispatch the NEXT frame's LoFTR steady program from the
    last completed frame's device-resident chain (track_monocular_pipelined
    twin of fused_host.dispatch_steady_spec)."""
    prep = prepare_spec_inputs(tracker, image)
    if prep is None:
        return None
    return dispatch_prepared(tracker, prep)
