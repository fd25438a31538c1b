"""Native C++ observation-graph core vs the pure-Python path."""

import numpy as np
import pytest

from mono_slam_framework_tpu import native
from mono_slam_framework_tpu.slam.frame import Frame, reset_frame_ids
from mono_slam_framework_tpu.slam.map_model import (
    KeyFrame,
    Map,
    MapPoint,
    reset_map_ids,
)

K = np.array([[250.0, 0, 160], [0, 250.0, 120], [0, 0, 1]], np.float32)


@pytest.fixture(autouse=True)
def _reset():
    reset_frame_ids()
    reset_map_ids()


def make_kf(map_, t):
    f = Frame(np.zeros((240, 320), np.float32), 0.0, K)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = t
    f.set_pose(T)
    return KeyFrame(f, map_, None)


def build_world(map_, rng):
    kfs = [make_kf(map_, (i, 0, 0)) for i in range(6)]
    mps = []
    for j in range(300):
        mp = MapPoint(rng.normal(size=3) + [0, 0, 5], kfs[0], map_)
        map_.add_map_point(mp)
        observers = rng.choice(6, size=rng.integers(2, 5), replace=False)
        for o in observers:
            kp = (int(j % 300), int(o))
            mp.add_observation(kfs[o], kp)
            kfs[o].add_map_point(mp, kp)
        mps.append(mp)
    return kfs, mps


class TestNativeGraph:
    def test_library_builds(self):
        assert native.available(), "g++ build of slamgraph.cc failed"

    def test_raw_api(self):
        g = native.ObservationGraph()
        assert g.add(1, 10)
        assert not g.add(1, 10)  # duplicate
        g.add(1, 11)
        g.add(2, 10)
        assert g.covis_counts(10) == {11: 1}
        assert g.n_obs_kf(10) == 2
        g.erase(1, 10)
        assert g.covis_counts(10) == {}
        g.add(1, 10)
        g.erase_map_point(1)
        assert g.n_obs_mp(1) == 0
        g.clear()
        assert g.n_obs_kf(10) == 0

    def test_update_connections_matches_python(self, rng):
        m_native = Map(use_native_graph=True)
        assert m_native.obs_graph is not None
        kfs_n, _ = build_world(m_native, np.random.default_rng(7))

        reset_frame_ids()
        reset_map_ids()
        m_py = Map(use_native_graph=False)
        kfs_p, _ = build_world(m_py, np.random.default_rng(7))

        for kn, kp in zip(kfs_n, kfs_p):
            kn.update_connections()
            kp.update_connections()
        for kn, kp in zip(kfs_n, kfs_p):
            wn = {k.id: w for k, w in kn.connections.items()}
            wp = {k.id: w for k, w in kp.connections.items()}
            assert wn == wp
            assert [k.id for k in kn.ordered_covisibles] == [
                k.id for k in kp.ordered_covisibles
            ]

    def test_cascades_keep_graph_consistent(self, rng):
        m = Map(use_native_graph=True)
        kfs, mps = build_world(m, rng)
        for kf in kfs:
            kf.update_connections()
        # kill a map point: its id must vanish from the graph
        mp = mps[0]
        mp.set_bad_flag()
        assert m.obs_graph.n_obs_mp(mp.id) == 0
        # fuse two points: graph moves observations to the survivor
        a, b = mps[1], mps[2]
        a.replace(b)
        assert m.obs_graph.n_obs_mp(a.id) == 0
        assert m.obs_graph.n_obs_mp(b.id) == b.n_obs
        # clearing the map clears the graph
        m.clear()
        assert m.obs_graph.n_obs_kf(kfs[0].id) == 0
