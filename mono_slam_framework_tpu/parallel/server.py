"""SlamServer: N camera streams, each a FULL System, served per tick with
their steady frames batched into ONE device program + ONE readback.

The reference serves one camera per process (src/main.cpp:100-188: one
Webots camera driving one System). `parallel/multistream.py` provides the
kernel for N streams' steady tracking as one program; this module is the
host orchestration that makes it a user-facing serving mode:

  * every stream is a complete, independent `System` (own map, tracker,
    local mapper, loop closer, matcher feature cache) — initialization,
    keyframe events, relocalization and loop closure all run per stream
    through the normal host paths;
  * at each tick, streams whose trackers are in the fused steady state
    (device-resident chain from the previous frame, unchanged local-map
    ctx — `fused_host.prepare_spec_inputs`) are grouped by program shape
    and dispatched as ONE `multistream.steady_step_batch` call; the packed
    results come back in ONE `device_get` (one relay round trip for the
    whole group) and are injected as per-tracker specs, which
    `fused_host.run_steady` consumes exactly like the pipelined mode's
    speculative dispatch;
  * streams that don't qualify this tick (initializing, just after a
    keyframe event, lost, non-ORB matcher) simply run their own
    `track_monocular` — the server never changes per-stream semantics,
    it only batches the device work and amortizes the readback.

Trajectory semantics per stream are those of the pipelined dispatch path
(device-computed velocity initialization via `chain_T_init`), parity-pinned
by tests/test_server.py against independently-run Systems.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mono_slam_framework_tpu.parallel import multistream
from mono_slam_framework_tpu.slam import fused_host, fused_loftr, fused_tracking


def _chain_T_init_batch_body(T_prev, T_prev2):
    return jax.vmap(fused_tracking.chain_T_init)(T_prev, T_prev2)


# the persistent compile cache keys include the jitted function name
_chain_T_init_batch_body.__name__ = "chain_T_init_batch"
_chain_T_init_batch_body.__qualname__ = "chain_T_init_batch"
chain_T_init_batch = jax.jit(_chain_T_init_batch_body)


class _LazyBatchFetch:
    """ONE shared device->host fetch of a group's batched packed buffer.

    The async copy is started at dispatch time; the first stream that
    replays triggers the (by then cheap) blocking fetch and every other
    stream reads its row from the same host array. Keeping the fetch lazy
    lets the whole tick's host work (and, in `step_pipelined`, the caller's
    entire next tick) overlap the device compute + relay transfer."""

    def __init__(self, packed_batch, stats: dict | None = None):
        self._d = packed_batch
        self._np = None
        self._stats = stats

    def row(self, j: int):
        if self._np is None:
            import time

            t0 = time.perf_counter()
            self._np = np.asarray(jax.device_get(self._d))
            self._d = None  # release the device handle
            if self._stats is not None:
                self._stats["readback_ms"] = self._stats.get(
                    "readback_ms", 0.0
                ) + (time.perf_counter() - t0) * 1000.0
                self._stats.setdefault("readback_samples_ms", []).append(
                    (time.perf_counter() - t0) * 1000.0
                )
        return self._np[j]


class SlamServer:
    """Serve N independent monocular streams on one chip (or one mesh).

    Parameters
    ----------
    parameters: a `SlamParameters` template, deep-copied per stream.
    matcher_factory: zero-arg callable returning a fresh FeatureMatcher per
        stream (each stream needs its own feature cache).
    n_streams: number of streams to serve.
    keyframe_database_factory: optional callable(matcher) -> KeyFrameDatabase;
        defaults to `KeyFrameMatchDatabase(matcher)`.
    cap_floors: capacity floors applied to every stream's pow2 shape
        buckets (keys mcap/mcap2/rcap/nkcap — see fused_host._floors).
        Independent streams' maps grow at different rates, so without
        floors their bucket keys diverge and almost nothing batches;
        with floors every steady stream shares ONE program shape (and ONE
        compiled executable). Defaults derive from the matcher's
        max_features. Pass {} to disable.
    """

    def __init__(
        self,
        parameters,
        matcher_factory: Callable[[], object],
        n_streams: int,
        *,
        keyframe_database_factory: Callable | None = None,
        cap_floors: dict | None = None,
        verbose: bool = False,
        rng_seed: int = 0,
    ):
        import copy

        from mono_slam_framework_tpu.slam.kfdb import KeyFrameMatchDatabase
        from mono_slam_framework_tpu.slam.system import System

        self.systems = []
        for s in range(n_streams):
            params = copy.deepcopy(parameters)
            matcher = matcher_factory()
            kf_db = (
                keyframe_database_factory(matcher)
                if keyframe_database_factory is not None
                else KeyFrameMatchDatabase(matcher)
            )
            system = System(
                params, matcher, kf_db, verbose=verbose, rng_seed=rng_seed + s
            )
            if cap_floors is None:
                f = 1 << (int(getattr(matcher, "max_features", 2000)) - 1).bit_length()
                floors = {"mcap": f, "mcap2": f, "rcap": f, "nkcap": 8}
            else:
                floors = dict(cap_floors)
            system.tracker._fused_cap_floors = floors
            self.systems.append(system)
        self.stats = {
            "ticks": 0,
            "frames": 0,
            "batched_frames": 0,
            "batch_groups": 0,
            "single_frames": 0,
        }
        self._pending: list | None = None

    # ------------------------------------------------------------------
    def _normalize(self, images, timestamps):
        n = len(self.systems)
        if len(images) != n:
            raise ValueError(f"expected {n} images, got {len(images)}")
        if timestamps is None:
            timestamps = float(self.stats["ticks"]) * 0.1
        if not isinstance(timestamps, (list, tuple, np.ndarray)):
            timestamps = [float(timestamps)] * n
        return images, timestamps

    def _sample(self, name: str, ms: float) -> None:
        self.stats[name] = self.stats.get(name, 0.0) + ms
        samples = self.stats.setdefault(
            f"{name.replace('_ms', '')}_samples_ms", []
        )
        samples.append(ms)
        if len(samples) > 4096:  # bound the long-running server's memory
            del samples[:2048]

    def _prepare_and_dispatch(self, images) -> None:
        """Build steady-qualifying streams' device inputs, group identical
        program shapes, and dispatch each group as ONE batched program (lone
        streams get a single-stream speculative dispatch instead — still
        overlapped, just not batched)."""
        import time

        from mono_slam_framework_tpu.matchers.loftr_matcher import (
            LoftrFeatureMatcher,
        )

        t0 = time.perf_counter()
        preps: dict[int, dict] = {}
        for i, img in enumerate(images):
            if img is None:
                continue
            tr = self.systems[i].tracker
            if getattr(tr, "_pipe_spec", None) is not None:
                continue  # a dispatch is already in flight for this stream
            # route by matcher type: the DNN matcher is a drop-in plugin
            # (dnnfeaturematcher.cpp:44-102) and its fast modes batch too
            if isinstance(tr.matcher, LoftrFeatureMatcher):
                prep = fused_loftr.prepare_spec_inputs(tr, img)
            else:
                prep = fused_host.prepare_spec_inputs(tr, img)
            if prep is not None:
                preps[i] = prep
        t1 = time.perf_counter()

        groups: dict[tuple, list[int]] = {}
        for i, prep in preps.items():
            groups.setdefault(prep["key"], []).append(i)
        for idxs in groups.values():
            if len(idxs) < 2:
                # a lone stream gains nothing from the batch wrapper; it
                # still gets the dispatch-ahead overlap via the
                # single-stream speculative program
                i = idxs[0]
                tr = self.systems[i].tracker
                mod = (
                    fused_loftr
                    if preps[i].get("kind") == "loftr"
                    else fused_host
                )
                tr._pipe_spec = mod.dispatch_prepared(tr, preps[i])
                self.stats["single_frames"] += 1
                continue
            self._dispatch_group(idxs, preps)
        self._sample("prepare_ms", (t1 - t0) * 1000.0)
        self._sample("dispatch_ms", (time.perf_counter() - t1) * 1000.0)

    def _track_all(self, images, timestamps) -> list:
        """Drive every stream's normal per-frame superloop; dispatched
        streams consume their injected spec inside fused_host.run_steady."""
        import time

        t0 = time.perf_counter()
        results: list = []
        for i, img in enumerate(images):
            if img is None:
                results.append(None)
                continue
            system = self.systems[i]
            system.track_monocular(img, float(timestamps[i]))
            results.append(system.get_current_position())
            self.stats["frames"] += 1
        self._sample("track_ms", (time.perf_counter() - t0) * 1000.0)
        return results

    def step(
        self,
        images: Sequence,
        timestamps: Sequence[float] | float | None = None,
    ) -> list:
        """Process one tick: one frame per stream (None skips a stream).

        Returns the per-stream current positions (None for skipped/lost).
        """
        images, timestamps = self._normalize(images, timestamps)
        self._prepare_and_dispatch(images)
        results = self._track_all(images, timestamps)
        self.stats["ticks"] += 1
        return results

    def step_pipelined(
        self,
        images: Sequence,
        timestamps: Sequence[float] | float | None = None,
    ) -> list:
        """One-tick-latency serving (the server twin of
        System.track_monocular_pipelined): replay the PREVIOUS tick's frames
        — whose batched device program and async host copy have been in
        flight since the last call — then prepare and dispatch THIS tick's
        batched program before returning. The group's device compute and
        relay readback overlap an entire tick of caller + host-replay time,
        so steady ticks cost roughly the host replay alone.

        Returns the previous tick's per-stream positions (all None on the
        first call); call `flush()` after the final tick."""
        images, timestamps = self._normalize(images, timestamps)
        prev = self._pending
        results = [None] * len(self.systems)
        if prev is not None:
            results = self._track_all(*prev)
        self._pending = (list(images), list(timestamps))
        self._prepare_and_dispatch(images)
        self.stats["ticks"] += 1
        return results

    def flush(self) -> list:
        """Complete the pending pipelined tick (if any)."""
        prev = self._pending
        self._pending = None
        results = [None] * len(self.systems)
        if prev is not None:
            results = self._track_all(*prev)
        for system in self.systems:
            system.tracker._pipe_spec = None
        return results

    # ------------------------------------------------------------------
    def _dispatch_group(self, idxs: list[int], preps: dict[int, dict]) -> None:
        if preps[idxs[0]].get("kind") == "loftr":
            return self._dispatch_group_loftr(idxs, preps)
        ps = [preps[i] for i in idxs]
        trackers = [self.systems[i].tracker for i in idxs]
        # pad the batch to a pow2 size by duplicating the last stream's
        # inputs (outputs of padded rows are ignored): group sizes vary tick
        # to tick (a stream drops out of steady state after a keyframe
        # event), and every distinct batch size is a separate executable —
        # a ~1.5 s load through the relay. pow2 padding caps the executable
        # count at log2(n_streams).
        b = len(ps)
        bcap = max(2, 1 << (b - 1).bit_length())
        ps = ps + [ps[-1]] * (bcap - b)
        ctxs = [p["ctx"] for p in ps]

        stack_tree = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
        imgs = jnp.stack([p["img_d"] for p in ps])
        prev_feats = stack_tree([p["prev_feats"] for p in ps])
        prev_px = jnp.stack([p["chain_px_d"] for p in ps])
        prev_row = jnp.stack([p["chain_row_d"] for p in ps])
        mp_pos = jnp.stack([p["mp_pos_d"] for p in ps])
        T_init = chain_T_init_batch(
            jnp.stack([p["T2_d"] for p in ps]),
            jnp.asarray(np.stack([p["T_prev_host"] for p in ps])),
        )
        kf_feats = stack_tree([c["kf_feats"] for c in ctxs])
        kf_px = jnp.stack([c["kf_px"] for c in ctxs])
        kf_row = jnp.stack([c["kf_row"] for c in ctxs])
        first_slot = jnp.stack([c["first_slot_d"] for c in ctxs])
        nrm = jnp.stack([c["normal_d"] for c in ctxs])
        maxd = jnp.stack([c["maxdist_d"] for c in ctxs])
        K = jnp.stack(
            [fused_host._k_dev(t) for t in trackers]
            + [fused_host._k_dev(trackers[-1])] * (bcap - b)
        )
        s = ps[0]["statics"]

        feats, packed, npx, nrow, nT2 = multistream.steady_step_batch(
            imgs, prev_feats, prev_px, prev_row, mp_pos, T_init,
            kf_feats, kf_px, kf_row, first_slot, nrm, maxd, K,
            s["ratio"], s["cols"], s["width"], s["height"],
            s["use_octave_info"], s["max_features"], s["fast_threshold"],
        )
        # THE one readback of the tick for this group: every stream's packed
        # row lands in one host copy (one relay round trip for all of them).
        # The copy starts NOW and the fetch is LAZY — the first stream that
        # replays blocks only for whatever hasn't landed yet, and in
        # step_pipelined a whole tick of caller time passes first.
        if hasattr(packed, "copy_to_host_async"):
            packed.copy_to_host_async()
        fetch = _LazyBatchFetch(packed, self.stats)
        for j, i in enumerate(idxs):
            tr = trackers[j]
            fused_host._count(tr, "dispatch")
            tr._pipe_spec = fused_host.finish_spec(
                tr,
                preps[i],
                jax.tree.map(lambda x, j=j: x[j], feats),
                (lambda j=j: fetch.row(j)),
                (npx[j], nrow[j], nT2[j]),
            )
        self.stats["batched_frames"] += len(idxs)
        self.stats["batch_groups"] += 1

    def _dispatch_group_loftr(
        self, idxs: list[int], preps: dict[int, dict]
    ) -> None:
        """LoFTR group: N streams' steady frames as ONE
        `multistream.steady_step_loftr_batch` program (the backbone convs
        batch onto the MXU) with ONE shared lazy readback — the DNN-matcher
        twin of the ORB group dispatch (VERDICT r3 #3)."""
        ps = [preps[i] for i in idxs]
        trackers = [self.systems[i].tracker for i in idxs]
        b = len(ps)
        bcap = max(2, 1 << (b - 1).bit_length())
        ps = ps + [ps[-1]] * (bcap - b)
        ctxs = [p["ctx"] for p in ps]

        imgs = jnp.stack([p["img_d"] for p in ps])
        f_prev = jnp.stack([p["f_prev"] for p in ps])  # [N,1,L,C]
        prev_cellrow = jnp.stack([p["cellrow_d"] for p in ps])
        mp_pos = jnp.stack([p["mp_pos_d"] for p in ps])
        T_init = chain_T_init_batch(
            jnp.stack([p["T2_d"] for p in ps]),
            jnp.asarray(np.stack([p["T_prev_host"] for p in ps])),
        )
        kf_feats = jnp.stack([c["kf_feats"] for c in ctxs])
        kf_cellrow = jnp.stack([c["kf_cellrow"] for c in ctxs])
        first_slot = jnp.stack([c["first_slot_d"] for c in ctxs])
        nrm = jnp.stack([c["normal_d"] for c in ctxs])
        maxd = jnp.stack([c["maxdist_d"] for c in ctxs])
        K = jnp.stack(
            [fused_host._k_dev(t) for t in trackers]
            + [fused_host._k_dev(trackers[-1])] * (bcap - b)
        )
        s = ps[0]["statics"]
        # weights are identical across streams (same checkpoint); pass one
        f_cur, packed, nrow, nT2 = multistream.steady_step_loftr_batch(
            imgs, trackers[0].matcher.params, f_prev, prev_cellrow, mp_pos,
            T_init, kf_feats, kf_cellrow, first_slot, nrm, maxd,
            ps[0]["tables"]["uv"], K, jnp.float32(ps[0]["info_val"]),
            s["threshold"], s["width"], s["height"], s["resize_hw"],
        )
        if hasattr(packed, "copy_to_host_async"):
            packed.copy_to_host_async()
        fetch = _LazyBatchFetch(packed, self.stats)
        for j, i in enumerate(idxs):
            tr = trackers[j]
            fused_host._count(tr, "dispatch")
            tr._pipe_spec = fused_loftr.finish_spec(
                tr,
                preps[i],
                f_cur[j],
                (lambda j=j: fetch.row(j)),
                (nrow[j], nT2[j]),
            )
        self.stats["batched_frames"] += len(idxs)
        self.stats["batch_groups"] += 1
