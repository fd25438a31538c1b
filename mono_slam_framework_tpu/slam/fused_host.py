"""Host driver for the fused steady-state tracking path.

Orchestrates slam/fused_tracking.py's two device programs and replays their
association tables into the host map model with the exact semantics of the
unfused path (tracking.py::track_with_motion_model + track_local_map — see
the fused_tracking module docstring for the semantics contract). Falls back
to the reference-twin host path (returning None) whenever the fused
preconditions fail, so behavior degrades to the unfused flow, never diverges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mono_slam_framework_tpu.matchers.base import MatchFramesResult
from mono_slam_framework_tpu.slam import fused_tracking


def _pow2(n: int, floor: int = 64) -> int:
    n = max(int(n), floor)
    return 1 << (n - 1).bit_length()


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
    mcap = _pow2(len(prev_items))
    prev_px = np.full(mcap, -1, np.int32)
    prev_row = np.full(mcap, -1, np.int32)
    for i, (idx, it) in enumerate(prev_items):
        prev_px[i] = idx
        prev_row[i] = row_of[id(it.map_point)]
    pcap1 = _pow2(len(mps1), floor=8)
    mp_pos1 = np.zeros((pcap1, 3), np.float32)
    for mp, r in ((mp, row_of[id(mp)]) for mp in mps1):
        mp_pos1[r] = mp.world_pos

    feats, T1_d, row_d, keep_d, inl_d, n_good_d, n_matches_d, idx2_d, ok_d = (
        fused_tracking.motion_step(
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
    )
    # seed the matcher cache so later stages (KF creation, local mapping)
    # reuse the device features without re-extracting
    m.seed_cache(cur, feats)

    (T1, row, keep, inlier, n_good, n_matches, idx2, okm, cur_xy_f, cur_oct) = (
        jax.device_get(
            (T1_d, row_d, keep_d, inl_d, n_good_d, n_matches_d, idx2_d, ok_d,
             feats.xy, feats.octave)
        )
    )
    cur_xy_i = cur_xy_f.astype(np.int32)

    # match image from the raw matches (CreateCurrentMatchImage, quirk B6)
    prev_xy = np.asarray(prev_feats.xy)[idx2]
    res = MatchFramesResult(
        frame1=cur,
        frame2=tracker.last_frame,
        keypoints1=cur_xy_i[okm],
        keypoints2=prev_xy[okm].astype(np.int32),
    )
    tracker.create_current_match_image(res)

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

    # candidate collection with the cross-KF dedup marker (589-599)
    cand_mps, cand_slot = [], []
    for slot, kf in enumerate(tracker.local_keyframes):
        for _, item in kf.map_point_items():
            mp = item.map_point
            if mp is None or mp.is_bad:
                continue
            if mp.track_reference_for_frame == cur.id:
                continue
            mp.track_reference_for_frame = cur.id
            if mp.last_frame_seen != cur.id:
                cand_mps.append(mp)
                cand_slot.append(slot)

    n_kf = len(tracker.local_keyframes)
    if n_kf == 0:
        return None
    nkcap = _pow2(n_kf, floor=4)
    kfs = list(tracker.local_keyframes) + [tracker.local_keyframes[0]] * (
        nkcap - n_kf
    )

    # per-KF association tables + shared row space
    kf_items = [
        [
            (idx, it)
            for idx, it in kf.keypoint_map.items()
            if it.map_point is not None and not it.map_point.is_bad
        ]
        for kf in kfs
    ]
    cur_assoc_mps = [
        cur.keypoint_map._items[i].map_point for i in slot_of_pixel
    ]
    row_of2, mps2 = _row_tables(
        [cur_assoc_mps, cand_mps]
        + [[it.map_point for _, it in items] for items in kf_items]
    )
    mcap2 = _pow2(max((len(i) for i in kf_items), default=1))
    kf_px = np.full((nkcap, mcap2), -1, np.int32)
    kf_row = np.full((nkcap, mcap2), -1, np.int32)
    for kslot, items in enumerate(kf_items):
        for i, (idx, it) in enumerate(items):
            kf_px[kslot, i] = idx
            kf_row[kslot, i] = row_of2[id(it.map_point)]
    # mask padded keyframe slots entirely
    kf_row[n_kf:] = -1

    ccap = _pow2(len(cand_mps))
    cand_pos = np.zeros((ccap, 3), np.float32)
    cand_normal = np.zeros((ccap, 3), np.float32)
    cand_maxdist = np.zeros(ccap, np.float32)
    cand_slot_arr = np.full(ccap, -1, np.int32)
    for i, (mp, s) in enumerate(zip(cand_mps, cand_slot)):
        cand_pos[i] = mp.world_pos
        cand_normal[i] = mp.normal
        cand_maxdist[i] = mp.distance_invariance()
        cand_slot_arr[i] = s

    pcap2 = _pow2(len(mps2), floor=8)
    mp_pos2 = np.zeros((pcap2, 3), np.float32)
    for mp in mps2:
        mp_pos2[row_of2[id(mp)]] = mp.world_pos

    k_slots = cur_xy_f.shape[0]
    cur_row = np.full(k_slots, -1, np.int32)
    for pix, s in slot_of_pixel.items():
        cur_row[s] = row_of2[id(cur.keypoint_map._items[pix].map_point)]

    kf_feats = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[m.features_for(kf) for kf in kfs]
    )
    T2_d, new_row_d, inl2_d, n_inl_d, vis_d, _ = fused_tracking.local_step(
        feats,
        jnp.asarray(cur_row),
        T1_d,
        kf_feats,
        jnp.asarray(kf_px),
        jnp.asarray(kf_row),
        jnp.asarray(cand_pos),
        jnp.asarray(cand_normal),
        jnp.asarray(cand_maxdist),
        jnp.asarray(cand_slot_arr),
        jnp.asarray(mp_pos2),
        T1_d,
        jnp.asarray(tracker.K, jnp.float32),
        jnp.float32(m.threshold),
        jnp.int32(cols),
        jnp.float32(tracker.img_width),
        jnp.float32(tracker.img_height),
        jnp.bool_(tracker.octave_information),
    )
    T2, new_row, inlier2, vis = jax.device_get((T2_d, new_row_d, inl2_d, vis_d))

    # frustum-visible candidates observed (Tracking.cc:612-616)
    for i in np.nonzero(vis[: len(cand_mps)])[0]:
        cand_mps[i].increase_visible()

    # replay new associations (first-wins already resolved on device)
    for s in np.nonzero(new_row >= 0)[0]:
        mp = mps2[new_row[s]]
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
