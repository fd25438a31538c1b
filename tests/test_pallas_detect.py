"""Fused Pallas detection kernel vs the XLA reference path (interpret mode).

The kernel must be a drop-in replacement for the unfused stage: identical
corner/NMS selection pattern and numerically-equal moment/blur maps inside
the detection interior (outside it, roll wrap-around differs by design and
is masked by the 31px border).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mono_slam_framework_tpu.ops import fast, filters, orb, pallas_detect


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    return jnp.asarray(
        np.kron(rng.uniform(0, 255, (16, 20)).astype(np.float32), np.ones((8, 8)))
    )


@pytest.fixture(scope="module")
def fused(img):
    return pallas_detect.detect_stage(img, 20.0, 31, interpret=True)


def _interior(shape, border=31):
    m = np.zeros(shape, bool)
    m[border : shape[0] - border, border : shape[1] - border] = True
    return m


class TestPallasDetect:
    def test_score_matches_xla_path(self, img, fused):
        score, _, _, _, _ = fused
        is_c, _ = fast.fast_score_map(img, 20.0)
        harris = fast.harris_response(img)
        h, w = img.shape
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        inside = (yy >= 31) & (yy < h - 31) & (xx >= 31) & (xx < w - 31)
        cand = jnp.where(is_c & inside, harris, -jnp.inf)
        nms = cand >= filters.max_pool_3x3_same(cand)
        ref = np.asarray(jnp.where(nms, cand, -jnp.inf))
        got = np.asarray(score)
        m = _interior(got.shape)
        assert (np.isfinite(got[m]) == np.isfinite(ref[m])).all()
        fin = np.isfinite(ref[m]) & np.isfinite(got[m])
        np.testing.assert_allclose(
            got[m][fin], ref[m][fin], rtol=1e-5, atol=1e-2
        )

    def test_moments_and_blur_match(self, img, fused):
        _, m10, m01, blur, harris = fused
        harris_ref = fast.harris_response(img)
        m = _interior(img.shape)
        np.testing.assert_allclose(
            np.asarray(harris)[m], np.asarray(harris_ref)[m], rtol=5e-4, atol=1.0
        )
        m10_ref, m01_ref = orb._moment_maps(img)
        blur_ref = filters.gaussian_blur(img)
        m = _interior(img.shape)
        # atol 2.0: the kernel's doubling moment filters reassociate the f32
        # sums; on patch masses of ~1e5-1e6 an absolute moment error of ~1
        # shifts atan2(m01, m10) by ~1e-6 rad, far below the 12-degree rBRIEF
        # steering quantization
        np.testing.assert_allclose(
            np.asarray(m10)[m], np.asarray(m10_ref)[m], rtol=1e-4, atol=2.0
        )
        np.testing.assert_allclose(
            np.asarray(m01)[m], np.asarray(m01_ref)[m], rtol=1e-4, atol=2.0
        )
        np.testing.assert_allclose(
            np.asarray(blur)[m], np.asarray(blur_ref)[m], rtol=1e-5, atol=1e-3
        )

    def test_multi_level_maps_match_per_level(self):
        # ONE-launch whole-pyramid kernel vs the per-level kernel: identical
        # maps (interior) and identical score pattern, per level
        rng = np.random.default_rng(7)
        h0, w0 = 200, 160
        base = filters.gaussian_blur(
            jnp.asarray(rng.uniform(0, 255, (h0, w0)).astype(np.float32)),
            size=5,
            sigma=1.2,
        )
        dims = orb._level_dims(h0, w0)
        imgs = [base] + [
            filters.resize_bilinear(base, dims[l])
            for l in range(1, orb.N_LEVELS)
        ]
        outs, starts = pallas_detect.detect_stage_multi(
            tuple(imgs), 10.0, 31, interpret=True
        )
        for l, im in enumerate(imgs):
            h, w = im.shape
            ref = pallas_detect.detect_stage(im, 10.0, 31, interpret=True)
            got_score = np.asarray(outs[0][starts[l] : starts[l] + h, :w])
            ref_score = np.asarray(ref[0])
            assert (np.isfinite(got_score) == np.isfinite(ref_score)).all()
            fin = np.isfinite(ref_score)
            np.testing.assert_array_equal(got_score[fin], ref_score[fin])
            m = _interior((h, w))
            if not m.any():
                continue
            for k in range(1, 5):
                np.testing.assert_array_equal(
                    np.asarray(outs[k][starts[l] : starts[l] + h, :w])[m],
                    np.asarray(ref[k])[m],
                )

    def test_extract_fused_agrees_with_unfused(self):
        # end-to-end: the fused multi-level path must produce the same
        # feature SET as the unfused XLA path. A smooth non-lattice image
        # avoids tied Harris scores (ties order differently in the w0-stride
        # layout, which would make slot-wise comparison meaningless).
        rng = np.random.default_rng(3)
        img = filters.gaussian_blur(
            jnp.asarray(rng.uniform(0, 255, (200, 256)).astype(np.float32)),
            size=5,
            sigma=1.2,
        )
        f_ref = orb.extract(img, 200, use_fused=False)
        # interpret-mode pallas inside extract (an explicit interpret kwarg
        # at the call site would override a functools.partial default)
        orig = pallas_detect.detect_stage_multi_bands

        def forced(img_bands, dims, threshold=20.0, border=31,
                   interpret=False):
            return orig(img_bands, dims, threshold, border, interpret=True)

        pallas_detect.detect_stage_multi_bands = forced
        try:
            f_fused = orb.extract(img, 200, use_fused=True)
        finally:
            pallas_detect.detect_stage_multi_bands = orig

        def keyed(f):
            out = {}
            v = np.asarray(f.valid)
            xy = np.asarray(f.xy)
            oc = np.asarray(f.octave)
            desc = np.asarray(f.desc)
            for i in np.nonzero(v)[0]:
                # 1-decimal key: the multi path's matmul pyramid differs
                # from jax.image.resize by float reassociation epsilons
                out[(round(float(xy[i, 0]), 1), round(float(xy[i, 1]), 1),
                     int(oc[i]))] = np.asarray(desc[i])
            return out

        ref, fused = keyed(f_ref), keyed(f_fused)
        common = set(ref) & set(fused)
        # identical selection up to approx_max_k boundary effects
        assert len(common) >= 0.95 * max(len(ref), len(fused))
        dists = []
        for k in common:
            bits = np.bitwise_count(ref[k] ^ fused[k]).sum()
            dists.append(int(bits))
        dists = np.asarray(dists)
        # descriptors agree bit-for-bit except for pixels whose blurred
        # value sits on a rounding boundary under the epsilon pyramid delta
        assert (dists == 0).mean() >= 0.9
        assert dists.max() <= 16
