"""MapDrawer tests: snapshot hooks + the live viewer thread
(MapDrawer.cc:30-55 double buffer, 67-136 consumer loop twin)."""

import time
import urllib.request

import numpy as np

from mono_slam_framework_tpu.viz.map_drawer import MapDrawer


class _MP:
    def __init__(self, pos):
        self.world_pos = np.asarray(pos, np.float32)
        self.is_bad = False


class _KF:
    def __init__(self, center, Tcw=None):
        self._c = np.asarray(center, np.float32)
        self.is_bad = False
        self.Ow = self._c
        if Tcw is not None:
            self.Tcw = np.asarray(Tcw, np.float32)

    def get_camera_center(self):
        return self._c


class _Map:
    def __init__(self):
        self.mps = [_MP([0, 0, 5]), _MP([1, 0, 6]), _MP([0, 1, 4])]
        self.kfs = [_KF([0, 0, 0], Tcw=np.eye(4)), _KF([0.5, 0, 0])]

    def all_map_points(self):
        return self.mps

    def all_keyframes(self):
        return self.kfs


class TestMapDrawer:
    def test_snapshot_and_save(self, tmp_path):
        d = MapDrawer(_Map())
        d.start()
        d.update()
        d.set_pos_dir(0, 0, 0, 0, 0, 1)
        assert d.points.shape == (3, 3)
        assert d.kf_centers.shape == (2, 3)
        # per-KF view-direction glyph data (MapDrawer.cc:116-130 cones): the
        # first stub KF carries Tcw=I -> dir (0,0,1); the second has no pose
        # -> the default forward dir
        assert d.kf_dirs.shape == (2, 3)
        np.testing.assert_allclose(d.kf_dirs[0], [0, 0, 1])
        out = tmp_path / "map.npz"
        d.save(str(out))
        z = np.load(out)
        assert z["points"].shape == (3, 3)
        assert z["kf_dirs"].shape == (2, 3)
        assert z["trajectory"].shape == (1, 3)
        # the render path draws the KF frusta + camera cone without error
        png = tmp_path / "frusta.png"
        d.render(str(png))
        assert png.exists() and png.stat().st_size > 0
        d.stop()

    def test_live_viewer_thread_and_http(self, tmp_path):
        d = MapDrawer(_Map())
        d.start()
        png = tmp_path / "live.png"
        port = 18471
        d.start_viewer(str(png), interval=0.1, http_port=port)
        d.update()
        d.set_pos_dir(0, 0, 0, 0, 0, 1)
        deadline = time.time() + 20
        while not png.exists() and time.time() < deadline:
            time.sleep(0.2)
        assert png.exists(), "viewer thread produced no render"
        # the live HTTP 'window' serves the latest render
        deadline = time.time() + 10
        body = b""
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/map.png", timeout=2
                ) as r:
                    body = r.read()
                break
            except Exception:
                time.sleep(0.2)
        assert body.startswith(b"\x89PNG")
        d.stop()
        assert d._viewer_thread is None
