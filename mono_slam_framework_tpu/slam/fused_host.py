"""Host driver for the fused steady-state tracking paths.

Orchestrates slam/fused_tracking.py's device programs (`run`: two programs,
two readbacks; `run_steady`: one program, ONE readback) and replays their
association tables into the host map model with the exact semantics of the
unfused path (tracking.py::track_with_motion_model + track_local_map — see
the fused_tracking module docstring for the semantics contract). Falls back
to the reference-twin host path (returning None) whenever the fused
preconditions fail, so behavior degrades to the unfused flow, never diverges.

Per-frame host work is minimized by a keyed device context (`_ensure_ctx`):
the stacked local-KF features, association tables and geometry stay resident
on device between keyframe events, invalidated by KeyPointMap version
counters (slam/frame.py) and the map's geometry epoch (slam/map_model.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mono_slam_framework_tpu.matchers.base import MatchFramesResult
from mono_slam_framework_tpu.slam import fused_tracking


from mono_slam_framework_tpu.utils.buckets import ladder_cap


def _pow2(n: int, floor: int = 64) -> int:
    n = max(int(n), floor)
    return 1 << (n - 1).bit_length()


def _floors(tracker) -> dict:
    """Per-tracker capacity floors (parallel.server.SlamServer sets these):
    raising every pow2 bucket to a fixed floor makes the steady program's
    shape key identical across streams, so the server can batch them into
    ONE executable instead of one per (map size, window size) bucket."""
    return getattr(tracker, "_fused_cap_floors", None) or {}


def pipe_stats(tracker) -> dict:
    """Speculative-dispatch counters for the pipelined mode (created lazily;
    `dispatch` = programs fired ahead of time, `hit` = consumed, `miss_*` =
    invalidated between dispatch and consumption, `skip_*` = why no dispatch
    happened after a frame). Reported by bench.py per VERDICT round-2 #2."""
    s = getattr(tracker, "_pipe_stats", None)
    if s is None:
        s = {"dispatch": 0, "hit": 0}
        tracker._pipe_stats = s
    return s


def _count(tracker, key: str) -> None:
    s = pipe_stats(tracker)
    s[key] = s.get(key, 0) + 1


def applicable(tracker) -> bool:
    """Fused path preconditions: steady OK-state motion-model tracking with
    the ORB matcher (the DNN matcher has no slot-feature contract)."""
    from mono_slam_framework_tpu.matchers.orb_matcher import OrbFeatureMatcher

    return (
        getattr(tracker.params, "fusedTracking", False)
        and isinstance(tracker.matcher, OrbFeatureMatcher)
        and tracker.velocity is not None
        and tracker.current_frame.id >= tracker.last_reloc_frame_id + 2
    )


def _row_tables(mp_lists):
    """Assign a dense row per unique MapPoint across the given lists; returns
    (row_of: dict id(mp)->row, mps: list ordered by row)."""
    row_of: dict = {}
    mps: list = []
    for lst in mp_lists:
        for mp in lst:
            key = id(mp)
            if key not in row_of:
                row_of[key] = len(mps)
                mps.append(mp)
    return row_of, mps




def _k_dev(tracker):
    """Device-resident intrinsics (uploaded once per tracker)."""
    k = getattr(tracker, "_fused_K_dev", None)
    if k is None:
        k = jnp.asarray(tracker.K, jnp.float32)
        tracker._fused_K_dev = k
    return k


def _ensure_ctx(tracker, m) -> dict:
    """Local-map device context: stacked KF features + association tables +
    the KF-side row space + geometry tables. Rebuilt only when the local-KF
    set, any member's KeyPointMap version, or the map's geometry epoch
    changes (or a cached point turned bad) — between keyframe events this is
    fully static, so steady-state frames skip both the host table walk and
    the device-side feature re-stack."""
    # canonical (id-sorted) slot order: update_local_keyframes rebuilds its
    # list in vote order, which shuffles frame to frame even when the SET is
    # unchanged — sorting keeps the cache key (and the compiled shapes)
    # stable. Slot order only tie-breaks which KF proposes a shared pixel,
    # the same float-accumulation-level divergence the fused paths accept.
    local_kfs = sorted(tracker.local_keyframes, key=lambda kf: kf.id)
    n_kf = len(local_kfs)
    ckey = (
        tuple(kf.id for kf in local_kfs),
        tuple(kf.keypoint_map.version for kf in local_kfs),
        tracker.map.geometry_epoch,
    )
    ctx = getattr(tracker, "_fused_lm_ctx", None)
    if ctx is not None and ctx["key"] == ckey and not any(
        mp.is_bad for mp in ctx["mps"]
    ):
        return ctx

    # association-table capacities ride the coarse factor-4 ladder
    # (utils/buckets.py): each pow2 crossing used to recompile the BIG
    # steady_step executable (~1.5 s cached relay load) at the first steady
    # frame after a keyframe event — rung crossings are ~4x rarer
    fl = _floors(tracker)
    nkcap = _pow2(n_kf, floor=fl.get("nkcap", 4))
    kfs = local_kfs + [local_kfs[0]] * (nkcap - n_kf)
    kf_items = [
        [
            (idx, it)
            for idx, it in kf.keypoint_map.items()
            if it.map_point is not None and not it.map_point.is_bad
        ]
        for kf in kfs
    ]
    row_of_base, mps_base = _row_tables(
        [[it.map_point for _, it in items] for items in kf_items]
    )
    # first KF slot proposing each row, in (kf, item) walk order — the
    # cross-KF dedup marker's winner (Tracking.cc:589-599)
    first_slot = np.full(len(mps_base), -1, np.int32)
    for kslot in range(n_kf - 1, -1, -1):
        for _, it in kf_items[kslot]:
            first_slot[row_of_base[id(it.map_point)]] = kslot
    mcap2 = ladder_cap(
        max((len(i) for i in kf_items), default=1), fl.get("mcap2", 256)
    )
    kf_px = np.full((nkcap, mcap2), -1, np.int32)
    kf_row = np.full((nkcap, mcap2), -1, np.int32)
    for kslot, items in enumerate(kf_items):
        for i, (idx, it) in enumerate(items):
            kf_px[kslot, i] = idx
            kf_row[kslot, i] = row_of_base[id(it.map_point)]
    # mask padded keyframe slots entirely
    kf_row[n_kf:] = -1
    stack_key = tuple(kf.id for kf in kfs)
    stack_cache = getattr(tracker, "_fused_stack_cache", None)
    if stack_cache is not None and stack_cache[0] == stack_key:
        kf_feats = stack_cache[1]
    else:
        kf_feats = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[m.features_for(kf) for kf in kfs]
        )
        tracker._fused_stack_cache = (stack_key, kf_feats)
    # geometry tables over the row space, static until geometry_epoch
    # moves (position/normal writes bump it, map_model.py)
    nrows = len(mps_base)
    pos = np.zeros((nrows, 3), np.float32)
    nrm = np.zeros((nrows, 3), np.float32)
    maxd = np.zeros(nrows, np.float32)
    for r, mp in enumerate(mps_base):
        pos[r] = mp.world_pos
        nrm[r] = mp.normal
        maxd[r] = mp.distance_invariance()
    # one-step path: rcap-padded row space with device-resident geometry
    rcap = ladder_cap(nrows, fl.get("rcap", 256))
    fs_pad = np.full(rcap, -1, np.int32)
    fs_pad[:nrows] = first_slot
    nrm_pad = np.zeros((rcap, 3), np.float32)
    nrm_pad[:nrows] = nrm
    maxd_pad = np.zeros(rcap, np.float32)
    maxd_pad[:nrows] = maxd
    # under capacity floors the cached table is 2*rcap so ext/no-ext frames
    # share one program shape (see _mp_pos_for)
    pcap0 = 2 * rcap if fl else rcap
    pos_pad = np.zeros((pcap0, 3), np.float32)
    pos_pad[:nrows] = pos
    ctx = {
        "key": ckey,
        "n_kf": n_kf,
        "rcap": rcap,
        "row_of": row_of_base,
        "mps": mps_base,
        "first_slot": first_slot,
        "pos": pos,
        "normal": nrm,
        "maxdist": maxd,
        "kf_px": jnp.asarray(kf_px),
        "kf_row": jnp.asarray(kf_row),
        "kf_feats": kf_feats,
        "first_slot_d": jnp.asarray(fs_pad),
        "normal_d": jnp.asarray(nrm_pad),
        "maxdist_d": jnp.asarray(maxd_pad),
        # device-resident position table over the rcap row space: steady
        # frames without extension rows reuse it instead of rebuilding and
        # re-uploading mp_pos every frame (host cost + relay transfer)
        "mp_pos_d": jnp.asarray(pos_pad),
    }
    tracker._fused_lm_ctx = ctx
    return ctx


def run(tracker) -> bool | None:
    """Run the fused motion + local steps. Returns the final tracking ok
    (True/False) or None when the caller must fall back to the host path."""
    m = tracker.matcher
    cur = tracker.current_frame
    cols = cur.keypoint_map.cols

    # ---- motion step -----------------------------------------------------
    tracker.update_last_frame()
    T_init = (tracker.velocity @ tracker.last_frame.Tcw).astype(np.float32)
    cur.keypoint_map.clear()

    prev_feats = m.features_for(tracker.last_frame)
    prev_items = [
        (idx, it)
        for idx, it in tracker.last_frame.keypoint_map.items()
        if it.map_point is not None
    ]
    row_of, mps1 = _row_tables([[it.map_point for _, it in prev_items]])
    mcap = ladder_cap(len(prev_items), 256)
    prev_px = np.full(mcap, -1, np.int32)
    prev_row = np.full(mcap, -1, np.int32)
    for i, (idx, it) in enumerate(prev_items):
        prev_px[i] = idx
        prev_row[i] = row_of[id(it.map_point)]
    pcap1 = ladder_cap(len(mps1), 256)
    mp_pos1 = np.zeros((pcap1, 3), np.float32)
    for mp, r in ((mp, row_of[id(mp)]) for mp in mps1):
        mp_pos1[r] = mp.world_pos

    feats, T1_d, packed_d = fused_tracking.motion_step(
        jnp.asarray(cur.image, jnp.float32),
        prev_feats,
        jnp.asarray(prev_px),
        jnp.asarray(prev_row),
        jnp.asarray(mp_pos1),
        jnp.asarray(T_init),
        jnp.asarray(tracker.K, jnp.float32),
        jnp.float32(m.threshold),
        jnp.int32(cols),
        jnp.bool_(tracker.octave_information),
        m.max_features,
        m.fast_threshold,
    )
    # seed the matcher cache so later stages (KF creation, local mapping)
    # reuse the device features without re-extracting
    m.seed_cache(cur, feats)

    # one buffer = one relay round trip; unpack on host
    p = np.asarray(jax.device_get(packed_d))
    k_slots = (p.shape[0] - 18) // 8
    T1 = p[:16].reshape(4, 4)
    n_matches = int(p[17])
    blk = p[18:].reshape(8, k_slots)
    row = blk[0].astype(np.int32)
    keep = blk[1] > 0.5
    inlier = blk[2] > 0.5
    idx2 = blk[3].astype(np.int32)
    okm = blk[4] > 0.5
    cur_xy_f = np.stack([blk[5], blk[6]], axis=-1)
    cur_oct = blk[7].astype(np.int32)
    cur_xy_i = cur_xy_f.astype(np.int32)

    # match image from the raw matches (CreateCurrentMatchImage, quirk B6).
    # last frame's xy came back in ITS packed readback — reuse the host copy
    # instead of pulling prev_feats.xy from the device (a relay round trip)
    cached = getattr(tracker, "_fused_prev_xy", None)
    if cached is not None and cached[0] == tracker.last_frame.id:
        prev_xy_host = cached[1]
    else:
        prev_xy_host = np.asarray(prev_feats.xy)
    tracker._fused_prev_xy = (cur.id, cur_xy_f)
    prev_xy = prev_xy_host[idx2]
    res = MatchFramesResult(
        frame1=cur,
        frame2=tracker.last_frame,
        keypoints1=cur_xy_i[okm],
        keypoints2=prev_xy[okm].astype(np.int32),
    )
    # has_mp per match straight from the device association (row >= 0 before
    # dedup) — skips N get_map_point dict lookups in the renderer
    tracker.create_current_match_image(res, has_mp=(row >= 0)[okm])

    if int(n_matches) < tracker.min_local_match_count:
        return None  # too few raw matches -> host ref-KF path

    info_of = (
        (lambda o: float(1.2 ** (-2.0 * o)))
        if tracker.octave_information
        else (lambda o: 1.0)
    )
    # replay associations (last-writer-wins already resolved on device):
    # inliers populate the keypoint map; outliers only stamp last_frame_seen
    slot_of_pixel: dict[int, int] = {}
    n_matches_map = 0
    for s in np.nonzero(keep)[0]:
        mp = mps1[row[s]]
        if inlier[s]:
            px = (int(cur_xy_i[s, 0]), int(cur_xy_i[s, 1]))
            cur.keypoint_map.set_map_point(
                px, mp,
                measurement=(float(cur_xy_f[s, 0]), float(cur_xy_f[s, 1])),
                info=info_of(int(cur_oct[s])),
            )
            slot_of_pixel[cur.keypoint_map.index_of(px)] = int(s)
            if mp.n_obs > 0:
                n_matches_map += 1
        else:
            mp.last_frame_seen = cur.id
    cur.set_pose(T1)

    if n_matches_map < 10:
        return None  # motion-model failed -> host ref-KF path

    # ---- local-map step --------------------------------------------------
    tracker.update_local_keyframes()

    # visible/seen bookkeeping for already-associated points
    # (SearchLocalPoints first loop, Tracking.cc:577-588)
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
    # update_local_keyframes / the loop above may have dropped entries
    slot_of_pixel = {
        pix: s for pix, s in slot_of_pixel.items() if pix in cur.keypoint_map._items
    }

    n_kf = len(tracker.local_keyframes)
    if n_kf == 0:
        return None

    ctx = _ensure_ctx(tracker, m)
    rcap = ctx["rcap"]
    nrows = len(ctx["mps"])

    # candidate mask over the cached ctx ROW space (shapes keyed to rcap —
    # stable between keyframe events; the old per-frame compacted candidate
    # arrays recompiled local_step on every candidate-count bucket change)
    cand_mask = np.zeros(rcap, bool)
    for r, mp in enumerate(ctx["mps"]):
        mp.track_reference_for_frame = cur.id
        if mp.last_frame_seen != cur.id:
            cand_mask[r] = True

    # extend the row space past rcap with current-frame associations the KF
    # tables don't cover (rare: points whose observers left the window)
    ext: list = []
    ext_rows: dict = {}
    def row_of_mp(mp):
        r = ctx["row_of"].get(id(mp))
        if r is not None:
            return r
        r = ext_rows.get(id(mp))
        if r is None:
            r = rcap + len(ext)
            ext_rows[id(mp)] = r
            ext.append(mp)
        return r

    k_slots = cur_xy_f.shape[0]
    cur_row = np.full(k_slots, -1, np.int32)
    for pix, s in slot_of_pixel.items():
        cur_row[s] = row_of_mp(cur.keypoint_map._items[pix].map_point)

    pcap2 = _pow2(rcap + len(ext))
    mp_pos2 = np.zeros((pcap2, 3), np.float32)
    mp_pos2[:nrows] = ctx["pos"]
    for j, mp in enumerate(ext):
        mp_pos2[rcap + j] = mp.world_pos

    packed2_d = fused_tracking.local_step(
        feats,
        jnp.asarray(cur_row),
        T1_d,
        ctx["kf_feats"],
        ctx["kf_px"],
        ctx["kf_row"],
        jnp.asarray(cand_mask),
        ctx["first_slot_d"],
        ctx["normal_d"],
        ctx["maxdist_d"],
        jnp.asarray(mp_pos2),
        T1_d,
        jnp.asarray(tracker.K, jnp.float32),
        jnp.float32(m.threshold),
        jnp.int32(cols),
        jnp.float32(tracker.img_width),
        jnp.float32(tracker.img_height),
        jnp.bool_(tracker.octave_information),
    )
    p2 = np.asarray(jax.device_get(packed2_d))
    T2 = p2[:16].reshape(4, 4)
    new_row = p2[17 : 17 + k_slots].astype(np.int32)
    inlier2 = p2[17 + k_slots : 17 + 2 * k_slots] > 0.5
    vis = p2[17 + 2 * k_slots :] > 0.5

    # frustum-visible candidates observed (Tracking.cc:612-616)
    for r in np.nonzero(vis[:nrows])[0]:
        ctx["mps"][r].increase_visible()

    def mp_of_row(r: int):
        return ctx["mps"][r] if r < nrows else ext[r - rcap]

    # replay new associations (first-wins already resolved on device)
    for s in np.nonzero(new_row >= 0)[0]:
        mp = mp_of_row(new_row[s])
        px = (int(cur_xy_i[s, 0]), int(cur_xy_i[s, 1]))
        cur.keypoint_map.set_map_point(
            px, mp,
            measurement=(float(cur_xy_f[s, 0]), float(cur_xy_f[s, 1])),
            info=info_of(int(cur_oct[s])),
        )
        slot_of_pixel[cur.keypoint_map.index_of(px)] = int(s)

    cur.set_pose(T2)

    # final inlier accounting (TrackLocalMap, Tracking.cc:497-516)
    tracker.n_matches_inliers = 0
    for pix, s in slot_of_pixel.items():
        item = cur.keypoint_map._items.get(pix)
        if item is None:
            continue
        item.outlier = not bool(inlier2[s])
        if not item.outlier:
            item.map_point.increase_found()
            if item.map_point.n_obs > 0:
                tracker.n_matches_inliers += 1

    coeff = tracker.n_matches_inliers / max(tracker.min_local_match_count, 1)
    tracker._log(
        f"Tracking coefficient - {coeff}, if < 1.0 then tracking will be lost."
    )
    return tracker.n_matches_inliers >= tracker.min_local_match_count


def _mp_pos_for(tracker, ctx, ext):
    """Position table (ctx rows up front, extension rows past rcap) for a
    steady dispatch. Under capacity floors (_floors) pcap is pinned at
    2*rcap so ext and ext-free frames share one program shape."""
    if not ext:
        return ctx["mp_pos_d"]  # cached device table
    rcap = ctx["rcap"]
    nrows = len(ctx["mps"])
    if _floors(tracker) and len(ext) <= rcap:
        pcap = 2 * rcap
    else:
        pcap = _pow2(rcap + len(ext))
    mp_pos = np.zeros((pcap, 3), np.float32)
    mp_pos[:nrows] = ctx["pos"]
    for j, mp in enumerate(ext):
        mp_pos[rcap + j] = mp.world_pos
    return jnp.asarray(mp_pos)


def run_steady(tracker) -> bool | None:
    """One-program steady-state frame (`fusedOneStep`): motion + local-map
    tracking with a SINGLE readback. Uses the local-KF window computed after
    the previous frame (one frame stale; refreshed here after the readback —
    see fused_tracking.steady_step). Returns the final tracking ok, or None
    to fall back to the two-program / host paths."""
    m = tracker.matcher
    cur = tracker.current_frame
    cols = cur.keypoint_map.cols
    if not tracker.local_keyframes:
        return None

    # speculative-dispatch consumption (track_monocular_pipelined): this
    # frame's device program may already be in flight, dispatched right
    # after the previous frame completed (dispatch_steady_spec). Valid only
    # while nothing touched the map state since: same ctx object, same
    # last frame, untouched clone.
    spec = getattr(tracker, "_pipe_spec", None)
    tracker._pipe_spec = None
    if spec is not None and spec.get("kind", "orb") != "orb":
        spec = None  # a foreign-matcher spec (defensive; routed by type)
    if spec is not None:
        ctx = _ensure_ctx(tracker, m)
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
        rcap = ctx["rcap"]
        nrows = len(ctx["mps"])
        tracker.update_last_frame()
        cur.keypoint_map.clear()
        prev_feats = m.features_for(tracker.last_frame)
        ext = spec["ext"]
        feats, packed_d = spec["feats"], spec["packed_d"]
        chain_px_d, chain_row_d, T2_d = spec["chain"]
        _count(tracker, "hit")
        return _replay_steady(
            tracker, m, cur, cols, ctx, rcap, nrows, ext, prev_feats,
            feats, packed_d, (chain_px_d, chain_row_d, T2_d),
        )

    # fire the image upload FIRST: it is the largest per-frame transfer and
    # travels the relay while the host builds tables below
    img_d = jax.device_put(np.asarray(cur.image, np.float32))
    ctx = _ensure_ctx(tracker, m)
    rcap = ctx["rcap"]
    nrows = len(ctx["mps"])

    tracker.update_last_frame()
    T_init = (tracker.velocity @ tracker.last_frame.Tcw).astype(np.float32)
    cur.keypoint_map.clear()

    prev_feats = m.features_for(tracker.last_frame)
    # prev associations in the ctx row space; points outside the window get
    # extension rows past rcap (their positions ride the mp_pos upload).
    # Fast path: the previous steady frame saved its final association
    # arrays — valid while the clone's KeyPointMap and the ctx are untouched.
    ext: list = []
    saved = getattr(tracker, "_fused_prev_assoc", None)
    if (
        saved is not None
        and saved["frame_id"] == tracker.last_frame.id
        and saved["ctx"] is ctx
        and saved["version"] == tracker.last_frame.keypoint_map.version
    ):
        # saved rows: >=0 are ctx rows; negative encode extension mps as
        # -(ext_index + 1) into saved["ext"]
        px_arr, row_arr = saved["px"], saved["row"]
        ext = list(saved["ext"])
        n_prev = px_arr.shape[0]
        mcap = ladder_cap(n_prev, _floors(tracker).get("mcap", 256))
        prev_px = np.full(mcap, -1, np.int32)
        prev_row = np.full(mcap, -1, np.int32)
        prev_px[:n_prev] = px_arr
        prev_row[:n_prev] = np.where(row_arr >= 0, row_arr, rcap - 1 - row_arr)
    else:
        prev_items = [
            (idx, it)
            for idx, it in tracker.last_frame.keypoint_map.items()
            if it.map_point is not None
        ]
        ext_rows: dict = {}
        mcap = ladder_cap(len(prev_items), _floors(tracker).get("mcap", 256))
        prev_px = np.full(mcap, -1, np.int32)
        prev_row = np.full(mcap, -1, np.int32)
        for i, (idx, it) in enumerate(prev_items):
            mp = it.map_point
            r = ctx["row_of"].get(id(mp))
            if r is None:
                r = ext_rows.get(id(mp))
                if r is None:
                    r = rcap + len(ext)
                    ext_rows[id(mp)] = r
                    ext.append(mp)
            prev_px[i] = idx
            prev_row[i] = r
    mp_pos_d = _mp_pos_for(tracker, ctx, ext)

    feats, packed_d, chain_px_d, chain_row_d, T2_d = fused_tracking.steady_step(
        img_d,
        prev_feats,
        jnp.asarray(prev_px),
        jnp.asarray(prev_row),
        mp_pos_d,
        jnp.asarray(T_init),
        ctx["kf_feats"],
        ctx["kf_px"],
        ctx["kf_row"],
        ctx["first_slot_d"],
        ctx["normal_d"],
        ctx["maxdist_d"],
        _k_dev(tracker),
        float(m.threshold),
        int(cols),
        float(tracker.img_width),
        float(tracker.img_height),
        bool(tracker.octave_information),
        m.max_features,
        m.fast_threshold,
    )
    return _replay_steady(
        tracker, m, cur, cols, ctx, rcap, nrows, ext, prev_feats,
        feats, packed_d, (chain_px_d, chain_row_d, T2_d),
    )


def _replay_steady(
    tracker, m, cur, cols, ctx, rcap, nrows, ext, prev_feats,
    feats, packed_d, chain,
):
    """Readback + full host replay of a steady_step result (shared by the
    direct and speculative-dispatch paths). `packed_d` may be a device
    array, an already-fetched numpy row, or a zero-arg callable returning
    the row (SlamServer's shared lazy batch fetch)."""
    m.seed_cache(cur, feats)

    # THE one readback of the frame
    if callable(packed_d):
        p = np.asarray(packed_d())
    else:
        p = np.asarray(jax.device_get(packed_d))
    k_slots = (p.shape[0] - 35 - rcap) // 10
    T1 = p[:16].reshape(4, 4)
    n_matches = int(p[17])
    blk = p[18 : 18 + 8 * k_slots].reshape(8, k_slots)
    row = blk[0].astype(np.int32)
    keep = blk[1] > 0.5
    inlier = blk[2] > 0.5
    idx2 = blk[3].astype(np.int32)
    okm = blk[4] > 0.5
    cur_xy_f = np.stack([blk[5], blk[6]], axis=-1)
    cur_oct = blk[7].astype(np.int32)
    cur_xy_i = cur_xy_f.astype(np.int32)
    off = 18 + 8 * k_slots
    T2 = p[off : off + 16].reshape(4, 4)
    new_row = p[off + 17 : off + 17 + k_slots].astype(np.int32)
    inlier2 = p[off + 17 + k_slots : off + 17 + 2 * k_slots] > 0.5
    vis = p[off + 17 + 2 * k_slots :] > 0.5

    # match image from the raw matches (CreateCurrentMatchImage, quirk B6)
    cached = getattr(tracker, "_fused_prev_xy", None)
    if cached is not None and cached[0] == tracker.last_frame.id:
        prev_xy_host = cached[1]
    else:
        prev_xy_host = np.asarray(prev_feats.xy)
    tracker._fused_prev_xy = (cur.id, cur_xy_f)
    prev_xy = prev_xy_host[idx2]
    res = MatchFramesResult(
        frame1=cur,
        frame2=tracker.last_frame,
        keypoints1=cur_xy_i[okm],
        keypoints2=prev_xy[okm].astype(np.int32),
    )
    # has_mp per match straight from the device association (row >= 0 before
    # dedup) — skips N get_map_point dict lookups in the renderer
    tracker.create_current_match_image(res, has_mp=(row >= 0)[okm])

    if n_matches < tracker.min_local_match_count:
        tracker._fused_chain = None
        return None  # too few raw matches -> host ref-KF path

    # freshness gate (params.fusedInlierFloorShare): a degraded final
    # inlier count means the one-frame-stale window no longer covers the
    # view (fresh-territory turns) — discard and re-track through the host
    # path, which rebuilds the window from scratch and self-heals the
    # stale-window feedback loop
    floor_share = getattr(tracker.params, "fusedInlierFloorShare", 0.0)
    if floor_share > 0.0:
        floor = max(
            tracker.min_local_match_count,
            int(floor_share * getattr(m, "max_features", 0)),
        )
        if int(np.count_nonzero(inlier2)) < floor:
            _count(tracker, "miss_quality")
            tracker._fused_chain = None
            return None

    def mp_of_row(r: int):
        return ctx["mps"][r] if r < nrows else ext[r - rcap]

    info_arr = (
        (1.2 ** (-2.0 * cur_oct.astype(np.float64)))
        if tracker.octave_information
        else np.ones(k_slots)
    )
    # motion association replay (last-writer-wins and bounds already
    # resolved on device; pixel indices computed vectorized)
    kept = np.nonzero(keep)[0]
    inl_s = kept[inlier[kept]]
    for s in kept[~inlier[kept]]:
        mp_of_row(row[s]).last_frame_seen = cur.id
    idxs = (cur_xy_i[inl_s, 1] * cols + cur_xy_i[inl_s, 0]).tolist()
    mps_in = [mp_of_row(r) for r in row[inl_s]]
    cur.keypoint_map.bulk_set_map_points(
        idxs,
        mps_in,
        list(zip(cur_xy_f[inl_s, 0].tolist(), cur_xy_f[inl_s, 1].tolist())),
        info_arr[inl_s].tolist(),
    )
    slot_of_pixel: dict[int, int] = dict(zip(idxs, inl_s.tolist()))
    n_matches_map = sum(1 for mp in mps_in if mp.n_obs > 0)
    cur.set_pose(T1)

    if n_matches_map < 10:
        tracker._fused_chain = None
        return None  # motion-model failed -> host ref-KF path

    # visible/seen bookkeeping for associated points (Tracking.cc:577-588)
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
    slot_of_pixel = {
        pix: s for pix, s in slot_of_pixel.items() if pix in cur.keypoint_map._items
    }

    # candidate marker parity + frustum-visible counters (Tracking.cc:589-616)
    for mp in ctx["mps"]:
        mp.track_reference_for_frame = cur.id
    for r in np.nonzero(vis[:nrows])[0]:
        ctx["mps"][r].increase_visible()

    # replay new associations (first-wins resolved on device; rows are
    # always ctx rows — only the KF tables propose)
    ns = np.nonzero(new_row >= 0)[0]
    idxs2 = (cur_xy_i[ns, 1] * cols + cur_xy_i[ns, 0]).tolist()
    cur.keypoint_map.bulk_set_map_points(
        idxs2,
        [ctx["mps"][r] for r in new_row[ns]],
        list(zip(cur_xy_f[ns, 0].tolist(), cur_xy_f[ns, 1].tolist())),
        info_arr[ns].tolist(),
    )
    slot_of_pixel.update(zip(idxs2, ns.tolist()))

    cur.set_pose(T2)

    # final inlier accounting (TrackLocalMap, Tracking.cc:497-516)
    tracker.n_matches_inliers = 0
    for pix, s in slot_of_pixel.items():
        item = cur.keypoint_map._items.get(pix)
        if item is None:
            continue
        item.outlier = not bool(inlier2[s])
        if not item.outlier:
            item.map_point.increase_found()
            if item.map_point.n_obs > 0:
                tracker.n_matches_inliers += 1

    # refresh the (one-frame-stale) window + reference KF for the keyframe
    # decision and the next frame's context
    tracker.update_local_keyframes()

    # save the final association arrays: the next steady frame rebuilds its
    # prev tables from them without walking the keypoint map (valid while
    # the cloned map and the ctx stay untouched)
    items = cur.keypoint_map._items
    pairs = [(pix, sl) for pix, sl in slot_of_pixel.items() if pix in items]
    if pairs:
        px_arr = np.asarray([pp for pp, _ in pairs], np.int32)
        s_arr = np.asarray([sl for _, sl in pairs], np.int64)
        rw = np.where(new_row[s_arr] >= 0, new_row[s_arr], row[s_arr])
        enc = np.where(rw >= rcap, -(rw - rcap) - 1, rw).astype(np.int32)
        tracker._fused_prev_assoc = {
            "frame_id": cur.id,
            "ctx": ctx,
            "version": 0,  # the clone's KeyPointMap starts at version 0
            "px": px_arr,
            "row": enc,
            "ext": ext,
        }
    else:
        tracker._fused_prev_assoc = None

    # device-resident chain for the NEXT frame's speculative dispatch:
    # this frame's final associations + pose stay on device; the previous
    # frame's (re-anchored) pose rides along for the velocity model
    ok_final = tracker.n_matches_inliers >= tracker.min_local_match_count
    if ok_final:
        tracker._fused_chain = {
            "frame_id": cur.id,
            # the chain's row values live in THIS ctx's row space (+ ext
            # offsets past rcap); a dispatch may only consume them under
            # the identical ctx object
            "ctx": ctx,
            "ext": ext,
            "chain": chain,
            "T_prev_host": np.array(tracker.last_frame.Tcw, np.float32),
        }
    else:
        tracker._fused_chain = None

    coeff = tracker.n_matches_inliers / max(tracker.min_local_match_count, 1)
    tracker._log(
        f"Tracking coefficient - {coeff}, if < 1.0 then tracking will be lost."
    )
    return ok_final


def prepare_spec_inputs(tracker, image) -> dict | None:
    """Build (without dispatching) the device inputs for a speculative
    steady_step launch from the tracker's device-resident chain state.

    Shared by `dispatch_steady_spec` (single stream, pipelined mode) and
    `parallel.server.SlamServer` (which stacks several trackers' prepared
    inputs into ONE `multistream.steady_step_batch` program). Returns None
    when the chain preconditions fail; performs no tracker mutation, so a
    prepared frame can still fall back to the fresh-dispatch path.
    """
    from mono_slam_framework_tpu.matchers.orb_matcher import OrbFeatureMatcher

    m = tracker.matcher
    ch = getattr(tracker, "_fused_chain", None)
    if (
        ch is None
        or not getattr(tracker.params, "fusedOneStep", False)
        or not isinstance(m, OrbFeatureMatcher)
        or tracker.last_frame is None
        or ch["frame_id"] != tracker.last_frame.id
        or tracker.velocity is None
        or not tracker.local_keyframes
    ):
        _count(tracker, "skip_no_chain")
        return None
    ctx = _ensure_ctx(tracker, m)
    if ctx is not ch["ctx"]:
        _count(tracker, "skip_ctx_changed")
        return None  # window/geometry changed; chain rows are stale
    rcap = ctx["rcap"]
    nrows = len(ctx["mps"])
    ext = ch["ext"]

    img_d = jax.device_put(np.asarray(image, np.float32))
    prev_feats = m.features_for(tracker.last_frame)
    chain_px_d, chain_row_d, T2_d = ch["chain"]

    mp_pos_d = _mp_pos_for(tracker, ctx, ext)

    statics = {
        "ratio": float(m.threshold),
        "cols": int(tracker.last_frame.keypoint_map.cols),
        "width": float(tracker.img_width),
        "height": float(tracker.img_height),
        "use_octave_info": bool(tracker.octave_information),
        "max_features": int(m.max_features),
        "fast_threshold": float(m.fast_threshold),
    }
    return {
        "kind": "orb",
        "img_d": img_d,
        "prev_feats": prev_feats,
        "chain_px_d": chain_px_d,
        "chain_row_d": chain_row_d,
        "T2_d": T2_d,
        "T_prev_host": np.asarray(ch["T_prev_host"], np.float32),
        "mp_pos_d": mp_pos_d,
        "ctx": ctx,
        "ext": ext,
        "statics": statics,
        # full batching key: identical statics AND identical input shapes
        # mean the prepared frames can share one batched program
        "key": (
            tuple(sorted(statics.items())),
            tuple(img_d.shape),
            int(chain_px_d.shape[0]),
            int(mp_pos_d.shape[0]),
            rcap,
            tuple(ctx["kf_px"].shape),
        ),
    }


def finish_spec(tracker, prep, feats, packed_d, chain) -> dict:
    """Package a dispatched steady program's handles as the spec consumed by
    run_steady's speculative branch. `packed_d` may be a device array (the
    async copy is started here) or an already-fetched numpy row (SlamServer's
    one-readback-per-tick path)."""
    if hasattr(packed_d, "copy_to_host_async"):
        # start the device->host copy NOW; by consumption time it has landed
        packed_d.copy_to_host_async()
    return {
        "kind": "orb",
        "prev_frame_id": tracker.last_frame.id,
        "ctx": prep["ctx"],
        "ext": prep["ext"],
        "feats": feats,
        "packed_d": packed_d,
        "chain": chain,
    }


def dispatch_steady_spec(tracker, image) -> dict | None:
    """Speculatively dispatch the NEXT frame's steady program from the last
    completed frame's device-resident chain state (track_monocular_pipelined).

    Called right after a frame finishes processing, with the next image in
    hand: the device program (and its async device->host result copy) runs
    while the caller produces/fetches the following frame, hiding both the
    compute and the readback round trip. The consumption side
    (run_steady's spec branch) re-validates that nothing touched the map
    state in between and falls back to a fresh dispatch otherwise.

    Routes to the DNN-matcher twin (fused_loftr.dispatch_steady_spec) when
    the tracker's matcher is LoFTR — the fast modes keep the reference's
    drop-in plugin symmetry (dnnfeaturematcher.cpp:44-102; VERDICT r3 #3).
    """
    from mono_slam_framework_tpu.matchers.loftr_matcher import (
        LoftrFeatureMatcher,
    )

    if isinstance(tracker.matcher, LoftrFeatureMatcher):
        from mono_slam_framework_tpu.slam import fused_loftr

        return fused_loftr.dispatch_steady_spec(tracker, image)
    prep = prepare_spec_inputs(tracker, image)
    if prep is None:
        return None
    return dispatch_prepared(tracker, prep)


def dispatch_prepared(tracker, prep) -> dict:
    """Dispatch a single-stream speculative steady program from an already
    prepared input set (`prepare_spec_inputs`). SlamServer uses this for
    streams whose shape group has only one member this tick — they still
    get the dispatch-ahead overlap, just not the batching."""
    _count(tracker, "dispatch")
    ctx = prep["ctx"]
    s = prep["statics"]
    T_init_d = fused_tracking.chain_T_init(
        prep["T2_d"], jnp.asarray(prep["T_prev_host"])
    )
    feats, packed_d, npx_d, nrow_d, nT2_d = fused_tracking.steady_step(
        prep["img_d"],
        prep["prev_feats"],
        prep["chain_px_d"],
        prep["chain_row_d"],
        prep["mp_pos_d"],
        T_init_d,
        ctx["kf_feats"],
        ctx["kf_px"],
        ctx["kf_row"],
        ctx["first_slot_d"],
        ctx["normal_d"],
        ctx["maxdist_d"],
        _k_dev(tracker),
        s["ratio"],
        s["cols"],
        s["width"],
        s["height"],
        s["use_octave_info"],
        s["max_features"],
        s["fast_threshold"],
    )
    return finish_spec(tracker, prep, feats, packed_d, (npx_d, nrow_d, nT2_d))
