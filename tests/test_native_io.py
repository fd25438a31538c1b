"""Native frame IO (native/frameio.cc): PNG/PGM decode + prefetch ring.

Pins the native decoder bit-exact against PIL (the Python fallback path) so
dataset runs produce identical frames whichever path serves them, and
exercises the decode-ahead worker (the C++ twin of the reference app's frame
acquisition, src/main.cpp:122-128 / GammaCorrector src/main.cpp:21-39).
"""

import os

import numpy as np
import pytest

from mono_slam_framework_tpu.native import frameio

pytestmark = pytest.mark.skipif(
    frameio.load_library() is None, reason="native toolchain unavailable"
)


def _pil_gray(path):
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), np.float32)


def _write_png(path, arr, mode):
    from PIL import Image

    Image.fromarray(arr, mode).save(path)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    rng = np.random.default_rng(7)
    d = tmp_path_factory.mktemp("frames")
    paths = {}

    gray = rng.integers(0, 256, (48, 64), np.uint8)
    paths["gray_png"] = str(d / "gray.png")
    _write_png(paths["gray_png"], gray, "L")

    rgb = rng.integers(0, 256, (32, 40, 3), np.uint8)
    paths["rgb_png"] = str(d / "rgb.png")
    _write_png(paths["rgb_png"], rgb, "RGB")

    rgba = rng.integers(0, 256, (16, 24, 4), np.uint8)
    paths["rgba_png"] = str(d / "rgba.png")
    _write_png(paths["rgba_png"], rgba, "RGBA")

    pgm = rng.integers(0, 256, (20, 30), np.uint8)
    paths["pgm"] = str(d / "img.pgm")
    with open(paths["pgm"], "wb") as f:
        f.write(b"P5\n# comment\n30 20\n255\n" + pgm.tobytes())
    paths["pgm_arr"] = pgm
    return paths


class TestDecode:
    def test_gray_png_matches_pil(self, images):
        got = frameio.decode(images["gray_png"])
        assert got is not None
        np.testing.assert_array_equal(got, _pil_gray(images["gray_png"]))

    def test_rgb_png_matches_pil(self, images):
        got = frameio.decode(images["rgb_png"])
        assert got is not None
        np.testing.assert_array_equal(got, _pil_gray(images["rgb_png"]))

    def test_rgba_png_matches_pil_rgb(self, images):
        # PIL convert("L") on RGBA drops alpha the same way (601-2 on RGB)
        got = frameio.decode(images["rgba_png"])
        assert got is not None
        from PIL import Image

        with Image.open(images["rgba_png"]) as im:
            want = np.asarray(im.convert("RGB").convert("L"), np.float32)
        np.testing.assert_array_equal(got, want)

    def test_pgm_binary(self, images):
        got = frameio.decode(images["pgm"])
        assert got is not None
        np.testing.assert_array_equal(got, images["pgm_arr"].astype(np.float32))

    def test_missing_file_returns_none(self):
        assert frameio.decode("/nonexistent/x.png") is None

    def test_garbage_returns_none(self, tmp_path):
        p = tmp_path / "junk.png"
        p.write_bytes(b"not an image at all")
        assert frameio.decode(str(p)) is None

    def test_gamma_lut_matches_reference_formula(self, images):
        # GammaCorrector (src/main.cpp:21-39): u8 LUT of pow(i/255, g)*255
        g = 0.77
        got = frameio.decode(images["gray_png"], gamma=g)
        base = _pil_gray(images["gray_png"])
        lut = np.floor(
            np.power(np.arange(256, dtype=np.float32) / 255.0, g) * 255.0
            + 0.5
        )
        np.testing.assert_array_equal(got, lut[base.astype(np.int32)])


class TestPrefetcher:
    def test_order_and_content(self, images):
        paths = [images["gray_png"], images["rgb_png"], images["pgm"]] * 3
        want = [frameio.decode(p) for p in paths]
        pf = frameio.FramePrefetcher(paths, ring=2)
        got = list(pf)
        assert [i for i, _ in got] == list(range(len(paths)))
        for (_, img), w in zip(got, want):
            np.testing.assert_array_equal(img, w)

    def test_bad_frame_yields_none(self, images, tmp_path):
        junk = tmp_path / "bad.png"
        junk.write_bytes(b"xx")
        pf = frameio.FramePrefetcher(
            [images["gray_png"], str(junk), images["pgm"]]
        )
        out = list(pf)
        assert out[0][1] is not None
        assert out[1][1] is None
        assert out[2][1] is not None

    def test_early_close(self, images):
        pf = frameio.FramePrefetcher([images["gray_png"]] * 8, ring=2)
        next(pf)
        pf.close()  # must not deadlock or leak the worker


class TestDatasetWiring:
    def test_load_gray_uses_native_and_matches_pil(self, images):
        from mono_slam_framework_tpu.io import datasets

        got = datasets._load_gray(images["rgb_png"])
        np.testing.assert_array_equal(got, _pil_gray(images["rgb_png"]))

    def test_stream_paths_prefetched(self, images, tmp_path):
        """The shared path-stream helper yields identical FrameData with and
        without the native prefetcher."""
        from mono_slam_framework_tpu.io import datasets

        paths = [images["gray_png"], images["rgb_png"], images["pgm"]]
        times = [0.0, 0.1, 0.2]
        native = list(datasets.stream_paths(times, paths, prefetch=2))
        plain = list(datasets.stream_paths(times, paths, prefetch=0))
        assert [f.timestamp for f in native] == times
        for a, b in zip(native, plain):
            assert a.timestamp == b.timestamp
            np.testing.assert_array_equal(a.image, b.image)
