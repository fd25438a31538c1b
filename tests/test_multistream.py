"""Multi-stream batched tracking (parallel/multistream.py) vs the
single-stream paths: extraction bit-parity per stream, and the batched
steady program against per-stream `_steady_core` runs.

Runs the Pallas detection kernel in interpret mode (CPU suite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mono_slam_framework_tpu.ops import orb
from mono_slam_framework_tpu.parallel import multistream
from mono_slam_framework_tpu.slam import fused_tracking

H, W = 120, 160
MAXF = 200


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    base = [
        np.kron(
            rng.uniform(0, 255, (H // 8, W // 8)).astype(np.float32),
            np.ones((8, 8), np.float32),
        )
        for _ in range(n)
    ]
    return jnp.asarray(np.stack(base))


@pytest.fixture(scope="module")
def batch3():
    imgs = _images(3)
    feats = multistream.extract_batch(imgs, MAXF, 20.0, interpret=True)
    return imgs, feats


class TestExtractBatch:
    def test_matches_single_stream_extraction(self, batch3):
        imgs, feats = batch3
        for i in range(imgs.shape[0]):
            ref = orb._extract_multi(imgs[i], MAXF, 20.0, interpret=True)
            one = jax.tree.map(lambda x: x[i], feats)
            assert np.array_equal(np.asarray(one.valid), np.asarray(ref.valid))
            v = np.asarray(ref.valid)
            np.testing.assert_allclose(
                np.asarray(one.xy)[v], np.asarray(ref.xy)[v], atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(one.angle)[v], np.asarray(ref.angle)[v], atol=1e-4
            )
            assert np.array_equal(
                np.asarray(one.octave)[v], np.asarray(ref.octave)[v]
            )
            # descriptors: quantized-blur rBRIEF is integer-exact, so the
            # batched path must agree bit-for-bit
            d1 = np.unpackbits(
                np.asarray(one.desc)[v].view(np.uint8), axis=-1
            )
            d2 = np.unpackbits(
                np.asarray(ref.desc)[v].view(np.uint8), axis=-1
            )
            assert (d1 == d2).mean() > 0.999

    def test_streams_differ(self, batch3):
        # sanity: distinct stream images yield distinct feature sets
        imgs, feats = batch3
        assert not np.array_equal(
            np.asarray(feats.xy[0]), np.asarray(feats.xy[2])
        )


class TestSteadyStepBatch:
    def _args(self, n):
        rng = np.random.default_rng(7)
        imgs = _images(n, seed=3)
        feats = multistream.extract_batch(imgs, MAXF, 20.0, interpret=True)
        mcap, rcap, nk, mcap2 = 64, 128, 2, 64
        mk = lambda *s: rng.integers(0, H * W, s).astype(np.int32)
        prev_px = mk(n, mcap)
        prev_row = rng.integers(-1, rcap, (n, mcap)).astype(np.int32)
        mp_pos = (rng.uniform(-2, 2, (n, rcap, 3)) + [0, 0, 6]).astype(
            np.float32
        )
        T_init = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4)).copy()
        kf_feats = jax.tree.map(
            lambda x: jnp.stack([x, x], axis=1), feats
        )  # [n, nk, ...]
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

    def test_matches_per_stream_core(self):
        n = 2
        (
            imgs, feats, prev_px, prev_row, mp_pos, T_init, kf_feats,
            kf_px, kf_row, first_slot, nrm, maxd, K,
        ) = self._args(n)
        out = multistream.steady_step_batch(
            imgs, feats, prev_px, prev_row, mp_pos, T_init, kf_feats,
            kf_px, kf_row, first_slot, nrm, maxd, K,
            0.7, W, float(W), float(H), True, MAXF, 20.0, interpret=True,
        )
        for i in range(n):
            ref = fused_tracking._steady_core(
                jax.tree.map(lambda x: x[i], feats),
                jax.tree.map(lambda x: x[i], feats),
                prev_px[i], prev_row[i], mp_pos[i], T_init[i],
                jax.tree.map(lambda x: x[i], kf_feats),
                kf_px[i], kf_row[i], first_slot[i], nrm[i], maxd[i], K[i],
                0.7, W, float(W), float(H), True, use_pallas_lm=False,
            )
            # NOTE: the batched program feeds extract_batch features as
            # prev_feats too (self-match frame), same as ref above
            np.testing.assert_allclose(
                np.asarray(out[1][i]), np.asarray(ref[1]), rtol=1e-4, atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(out[4][i]), np.asarray(ref[4]), rtol=1e-4, atol=1e-4
            )


class TestLoftrMultistream:
    """Batched LoFTR serving path (multistream.steady_step_loftr_batch)."""

    @pytest.fixture(scope="class")
    def loftr_setup(self):
        from mono_slam_framework_tpu.models import loftr_native

        params = loftr_native.load_params()
        H2, W2 = 96, 128
        n = 2
        rng = np.random.default_rng(11)
        imgs = np.stack(
            [
                np.kron(
                    rng.uniform(0, 255, (H2 // 8, W2 // 8)).astype(np.float32),
                    np.ones((8, 8), np.float32),
                )
                for _ in range(n)
            ]
        )
        return params, jnp.asarray(imgs), H2, W2

    def test_batched_encode_matches_single(self, loftr_setup):
        from mono_slam_framework_tpu.models import loftr_native

        params, imgs, H2, W2 = loftr_setup
        fb = loftr_native.encode(params, (imgs / 255.0)[:, None])
        for i in range(imgs.shape[0]):
            fi = loftr_native.encode(params, (imgs[i] / 255.0)[None, None])
            np.testing.assert_allclose(
                np.asarray(fb[i]), np.asarray(fi[0]), rtol=2e-3, atol=2e-3
            )

    def test_batch_matches_single_core(self, loftr_setup):
        from mono_slam_framework_tpu.models import loftr_native
        from mono_slam_framework_tpu.slam import fused_loftr

        params, imgs, H2, W2 = loftr_setup
        n = imgs.shape[0]
        gw, gh = W2 // 16, H2 // 16
        L = gw * gh
        rng = np.random.default_rng(13)
        fb = loftr_native.encode(params, (imgs / 255.0)[:, None])
        C = fb.shape[-1]
        rcap, nk = 64, 2
        f_prev = np.asarray(fb)[:, None]  # reuse as prev features [n,1,L,C]
        prev_cellrow = rng.integers(-1, rcap, (n, L)).astype(np.int32)
        mp_pos = (rng.uniform(-2, 2, (n, rcap, 3)) + [0, 0, 6]).astype(
            np.float32
        )
        T_init = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4)).copy()
        kf_feats = np.broadcast_to(
            np.asarray(fb)[:, None], (n, nk, L, C)
        ).copy()
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

        from mono_slam_framework_tpu.parallel import multistream

        out_f, out_packed, *_ = multistream.steady_step_loftr_batch(
            imgs, params, jnp.asarray(f_prev), jnp.asarray(prev_cellrow),
            jnp.asarray(mp_pos), jnp.asarray(T_init), jnp.asarray(kf_feats),
            jnp.asarray(kf_cellrow), jnp.asarray(first_slot),
            jnp.asarray(nrm), jnp.asarray(maxd), jnp.asarray(cell_uv),
            jnp.asarray(K), jnp.float32(1.0 / 64.0),
            0.1, float(W2), float(H2), None,
        )
        for i in range(n):
            # same f_cur as the batch (isolates the vmapped core, not the
            # batched-conv float drift covered by the encode test above)
            # out_f[i] is already [1, L, C]: the vmapped core returns the
            # per-stream f_cur with its batch dim intact
            ref_f, ref_packed, *_ = fused_loftr._loftr_core(
                out_f[i], params, jnp.asarray(f_prev[i]),
                jnp.asarray(prev_cellrow[i]), jnp.asarray(mp_pos[i]),
                jnp.asarray(T_init[i]), jnp.asarray(kf_feats[i]),
                jnp.asarray(kf_cellrow[i]), jnp.asarray(first_slot[i]),
                jnp.asarray(nrm[i]), jnp.asarray(maxd[i]),
                jnp.asarray(cell_uv), jnp.asarray(K[i]),
                jnp.float32(1.0 / 64.0), 0.1, float(W2), float(H2),
                use_pallas_lm=False,
            )
            a, b = np.asarray(out_packed[i]), np.asarray(ref_packed)
            assert a.shape == b.shape
            # row/flag tables must agree except at float-boundary flips
            assert (np.isclose(a, b, rtol=1e-3, atol=1e-3)).mean() > 0.99
