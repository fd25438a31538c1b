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
        np.testing.assert_allclose(
            np.asarray(m10)[m], np.asarray(m10_ref)[m], rtol=1e-4, atol=0.5
        )
        np.testing.assert_allclose(
            np.asarray(m01)[m], np.asarray(m01_ref)[m], rtol=1e-4, atol=0.5
        )
        np.testing.assert_allclose(
            np.asarray(blur)[m], np.asarray(blur_ref)[m], rtol=1e-5, atol=1e-3
        )

    def test_extract_fused_agrees_with_unfused(self, img):
        # end-to-end: the fused path must produce the same features
        f_ref = orb.extract(img, 200, use_fused=False)
        # interpret-mode pallas inside extract: monkeypatch detect_stage
        import functools

        orig = pallas_detect.detect_stage
        pallas_detect.detect_stage = functools.partial(orig, interpret=True)
        try:
            f_fused = orb.extract(img, 200, use_fused=True)
        finally:
            pallas_detect.detect_stage = orig
        v = np.asarray(f_ref.valid) & np.asarray(f_fused.valid)
        # subpixel offsets derive from the Harris surface; the fused and XLA
        # paths agree to f32 accumulation noise
        np.testing.assert_allclose(
            np.asarray(f_ref.xy)[v], np.asarray(f_fused.xy)[v], atol=1e-3
        )
        np.testing.assert_array_equal(
            np.asarray(f_ref.desc)[v], np.asarray(f_fused.desc)[v]
        )
