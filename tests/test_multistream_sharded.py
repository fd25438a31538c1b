"""Mesh-sharded multi-stream serving (multistream.steady_step_batch_sharded
and steady_step_loftr_batch_sharded): the stream axis split over the
8-device CPU mesh must reproduce the single-device batched program
bit-for-bit (pure data parallelism — no collectives in the steady loop).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mono_slam_framework_tpu.parallel import multistream
from mono_slam_framework_tpu.parallel.sweep import make_mesh

H, W = 120, 160
MAXF = 200


def _images(n, seed=3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.stack(
            [
                np.kron(
                    rng.uniform(0, 255, (H // 8, W // 8)).astype(np.float32),
                    np.ones((8, 8), np.float32),
                )
                for _ in range(n)
            ]
        )
    )


def _steady_args(n):
    rng = np.random.default_rng(7)
    imgs = _images(n)
    feats = multistream.extract_batch(imgs, MAXF, 20.0, interpret=True)
    mcap, rcap, nk, mcap2 = 64, 128, 2, 64
    mk = lambda *s: rng.integers(0, H * W, s).astype(np.int32)
    prev_px = mk(n, mcap)
    prev_row = rng.integers(-1, rcap, (n, mcap)).astype(np.int32)
    mp_pos = (rng.uniform(-2, 2, (n, rcap, 3)) + [0, 0, 6]).astype(np.float32)
    T_init = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4)).copy()
    kf_feats = jax.tree.map(lambda x: jnp.stack([x, x], axis=1), feats)
    kf_px = mk(n, nk, mcap2)
    kf_row = rng.integers(-1, rcap, (n, nk, mcap2)).astype(np.int32)
    first_slot = rng.integers(-1, nk, (n, rcap)).astype(np.int32)
    nrm = rng.normal(size=(n, rcap, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    maxd = rng.uniform(1, 10, (n, rcap)).astype(np.float32)
    K = np.broadcast_to(
        np.asarray(
            [[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]], np.float32
        ),
        (n, 3, 3),
    ).copy()
    return (
        imgs, feats, prev_px, prev_row, mp_pos, T_init, kf_feats,
        kf_px, kf_row, first_slot, nrm, maxd, K,
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a device mesh")
class TestShardedOrb:
    def test_matches_single_device_batch(self):
        n = 8
        args = _steady_args(n)
        statics = dict(
            ratio=0.7, cols=W, width=float(W), height=float(H),
            use_octave_info=True, max_features=MAXF, fast_threshold=20.0,
            interpret=True, use_pallas_lm=False,
        )
        ref = multistream.steady_step_batch(*args, **statics)
        mesh = make_mesh(4)
        got = multistream.steady_step_batch_sharded(mesh, *args, **statics)
        for g, r in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-4
            )

    def test_uneven_batch_rejected(self):
        args = _steady_args(2)
        mesh = make_mesh(4)
        with pytest.raises(ValueError):
            multistream.steady_step_batch_sharded(
                mesh, *args, ratio=0.7, cols=W, width=float(W),
                height=float(H), use_octave_info=True, max_features=MAXF,
                fast_threshold=20.0, interpret=True, use_pallas_lm=False,
            )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a device mesh")
class TestShardedLoftr:
    def test_matches_single_device_batch(self):
        from mono_slam_framework_tpu.models import loftr_native

        params = loftr_native.load_params()
        H2, W2, n = 96, 128, 4
        rng = np.random.default_rng(11)
        imgs = jnp.asarray(
            np.stack(
                [
                    np.kron(
                        rng.uniform(0, 255, (H2 // 8, W2 // 8)).astype(
                            np.float32
                        ),
                        np.ones((8, 8), np.float32),
                    )
                    for _ in range(n)
                ]
            )
        )
        gw, gh = W2 // 16, H2 // 16
        L = gw * gh
        fb = loftr_native.encode(params, (imgs / 255.0)[:, None])
        C = fb.shape[-1]
        rcap, nk = 64, 2
        f_prev = jnp.asarray(np.asarray(fb)[:, None])
        prev_cellrow = rng.integers(-1, rcap, (n, L)).astype(np.int32)
        mp_pos = (rng.uniform(-2, 2, (n, rcap, 3)) + [0, 0, 6]).astype(
            np.float32
        )
        T_init = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4)).copy()
        kf_feats = np.broadcast_to(np.asarray(fb)[:, None], (n, nk, L, C)).copy()
        kf_cellrow = rng.integers(-1, rcap, (n, nk, L)).astype(np.int32)
        first_slot = rng.integers(-1, nk, (n, rcap)).astype(np.int32)
        nrm = rng.normal(size=(n, rcap, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        maxd = rng.uniform(1, 10, (n, rcap)).astype(np.float32)
        cells = np.arange(L)
        cell_uv = np.stack(
            [(cells % gw) * 16, (cells // gw) * 16], -1
        ).astype(np.float32)
        K = np.broadcast_to(
            np.asarray(
                [[100.0, 0, W2 / 2], [0, 100.0, H2 / 2], [0, 0, 1]],
                np.float32,
            ),
            (n, 3, 3),
        ).copy()
        pos = (
            f_prev, jnp.asarray(prev_cellrow), jnp.asarray(mp_pos),
            jnp.asarray(T_init), jnp.asarray(kf_feats),
            jnp.asarray(kf_cellrow), jnp.asarray(first_slot),
            jnp.asarray(nrm), jnp.asarray(maxd), jnp.asarray(cell_uv),
            jnp.asarray(K), jnp.float32(1.0 / 64.0),
        )
        statics = dict(
            threshold=0.1, width=float(W2), height=float(H2), resize_hw=None
        )
        ref_f, ref_packed, *_ = multistream.steady_step_loftr_batch(
            imgs, params, *pos, **statics
        )
        mesh = make_mesh(2)
        got_f, got_packed, *_ = multistream.steady_step_loftr_batch_sharded(
            mesh, imgs, params, *pos, **statics
        )
        np.testing.assert_allclose(
            np.asarray(got_f), np.asarray(ref_f), rtol=2e-3, atol=2e-3
        )
        a, b = np.asarray(got_packed), np.asarray(ref_packed)
        assert a.shape == b.shape
        assert np.isclose(a, b, rtol=1e-3, atol=1e-3).mean() > 0.99
