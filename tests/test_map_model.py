"""Unit tests for the host-side map model (covisibility, spanning tree,
fusion, culling) — behaviors from KeyFrame.cc / MapPoint.cc."""

import numpy as np
import pytest

from mono_slam_framework_tpu.slam.frame import Frame, KeyPointMap, reset_frame_ids
from mono_slam_framework_tpu.slam.map_model import (
    KeyFrame,
    Map,
    MapPoint,
    reset_map_ids,
)

K = np.array([[250.0, 0, 160], [0, 250.0, 120], [0, 0, 1]], np.float32)


@pytest.fixture(autouse=True)
def _reset_ids():
    reset_frame_ids()
    reset_map_ids()


def make_kf(map_, pose_t=(0, 0, 0)):
    img = np.zeros((240, 320), np.float32)
    f = Frame(img, 0.0, K)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = pose_t
    f.set_pose(T)
    return KeyFrame(f, map_, None)


class TestKeyPointMap:
    def test_exact_pixel_semantics(self):
        """Quirk B1: lookup is exact-pixel only."""
        m = KeyPointMap(320, 240)
        mp = object()
        m.set_map_point((10, 20), mp)
        assert m.get_map_point((10, 20)) is mp
        assert m.get_map_point((11, 20)) is None  # 1px off -> miss
        assert m.get_map_point((10, 21)) is None

    def test_out_of_bounds_ignored(self):
        m = KeyPointMap(320, 240)
        m.set_map_point((-1, 5), object())
        m.set_map_point((320, 5), object())
        assert m.size == 0
        assert m.get_map_point((500, 500)) is None

    def test_index_roundtrip_and_outliers(self):
        m = KeyPointMap(320, 240)
        idx = m.index_of((13, 27))
        assert m.keypoint_from_index(idx) == (13, 27)
        m.set_map_point((13, 27), object())
        m.set_outlier(idx, True)
        assert m.is_outlier(idx)
        m.set_map_point_by_index(idx, None)
        assert m.size == 0


class TestCovisibility:
    def _link(self, map_, kf1, kf2, n_shared, start=0):
        """Create n_shared map points observed by both kfs."""
        for i in range(n_shared):
            mp = MapPoint(np.array([i, 0, 5.0]), kf1, map_)
            kp1 = (start + i, 10)
            kp2 = (start + i, 20)
            mp.add_observation(kf1, kp1)
            mp.add_observation(kf2, kp2)
            kf1.add_map_point(mp, kp1)
            kf2.add_map_point(mp, kp2)
            map_.add_map_point(mp)

    def test_connection_threshold_15(self):
        map_ = Map()
        a = make_kf(map_)
        b = make_kf(map_, (1, 0, 0))
        c = make_kf(map_, (2, 0, 0))
        self._link(map_, a, b, 20)
        self._link(map_, a, c, 5, start=100)
        a.update_connections()
        # b passes the threshold; c doesn't but the map still records counts
        assert a.get_weight(b) == 20
        assert b in a.get_best_covisibles(5)
        assert a.connections.get(c) == 5  # raw counter kept (KeyFrame.cc:252)

    def test_below_threshold_keeps_best(self):
        map_ = Map()
        a = make_kf(map_)
        b = make_kf(map_, (1, 0, 0))
        self._link(map_, a, b, 4)  # below threshold 15
        a.update_connections()
        assert b.get_weight(a) == 4  # max-counter fallback (KeyFrame.cc:239-242)

    def test_spanning_tree_parent(self):
        map_ = Map()
        a = make_kf(map_)  # id 0
        b = make_kf(map_, (1, 0, 0))  # id 1
        self._link(map_, a, b, 20)
        a.update_connections()
        b.update_connections()
        assert b.parent is a
        assert b in a.children

    def test_set_bad_flag_reassigns_children(self):
        map_ = Map()
        a = make_kf(map_)  # id 0 root
        b = make_kf(map_, (1, 0, 0))
        c = make_kf(map_, (2, 0, 0))
        map_.add_keyframe(a), map_.add_keyframe(b), map_.add_keyframe(c)
        self._link(map_, a, b, 20)
        self._link(map_, b, c, 20, start=200)
        self._link(map_, a, c, 16, start=400)
        a.update_connections()
        b.update_connections()
        c.update_connections()
        assert c.parent is b or c.parent is a
        b.set_bad_flag()
        assert b.is_bad
        assert b not in map_.keyframes
        # c re-parented to a surviving keyframe
        assert c.parent is a
        assert c in a.children

    def test_kf0_never_culled(self):
        map_ = Map()
        a = make_kf(map_)
        map_.add_keyframe(a)
        a.set_bad_flag()
        assert not a.is_bad


class TestMapPoint:
    def test_erase_observation_cascade(self):
        map_ = Map()
        kfs = [make_kf(map_, (i, 0, 0)) for i in range(3)]
        mp = MapPoint(np.array([0, 0, 5.0]), kfs[0], map_)
        map_.add_map_point(mp)
        for i, kf in enumerate(kfs):
            mp.add_observation(kf, (i, 0))
            kf.add_map_point(mp, (i, 0))
        assert mp.n_obs == 3
        mp.erase_observation(kfs[2])
        # down to 2 observations -> bad cascade (MapPoint.cc:114)
        assert mp.is_bad
        assert mp not in map_.map_points
        assert kfs[0].get_map_point((0, 0)) is None

    def test_replace_merges_observations(self):
        map_ = Map()
        kf1 = make_kf(map_)
        kf2 = make_kf(map_, (1, 0, 0))
        kf3 = make_kf(map_, (2, 0, 0))
        mp_a = MapPoint(np.array([0, 0, 5.0]), kf1, map_)
        mp_b = MapPoint(np.array([0, 0, 5.1]), kf1, map_)
        map_.add_map_point(mp_a), map_.add_map_point(mp_b)
        for kf, kp in [(kf1, (1, 1)), (kf2, (2, 2)), (kf3, (3, 3))]:
            mp_a.add_observation(kf, kp)
            kf.add_map_point(mp_a, kp)
        for kf, kp in [(kf1, (5, 5)), (kf2, (6, 6)), (kf3, (7, 7))]:
            mp_b.add_observation(kf, kp)
            kf.add_map_point(mp_b, kp)
        mp_a.replace(mp_b)
        assert mp_a.is_bad and mp_a.replaced_by is mp_b
        # kf1 already saw mp_b -> mp_a's slot erased; pixels where only mp_a
        # existed now point to mp_b
        assert kf1.get_map_point((1, 1)) is None
        assert mp_b.n_found >= 2
        assert mp_a not in map_.map_points

    def test_normal_and_depth(self):
        map_ = Map()
        kf = make_kf(map_)
        mp = MapPoint(np.array([0, 0, 5.0]), kf, map_)
        mp.add_observation(kf, (0, 0))
        mp.update_normal_and_depth()
        np.testing.assert_allclose(mp.normal, [0, 0, 1], atol=1e-6)
        assert abs(mp.distance - 5.0) < 1e-6
        assert abs(mp.distance_invariance() - 6.0) < 1e-5

    def test_scene_median_depth_lower_median(self):
        """Quirk B3: index (n-1)//q -> lower median."""
        map_ = Map()
        kf = make_kf(map_)
        for i, z in enumerate([2.0, 4.0, 6.0, 8.0]):
            mp = MapPoint(np.array([0, 0, z]), kf, map_)
            kf.add_map_point(mp, (i, 0))
        # depths sorted [2,4,6,8]; (4-1)//2 = 1 -> 4.0 (not 5.0)
        assert kf.compute_scene_median_depth(2) == 4.0
