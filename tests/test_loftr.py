"""LoFTR model + matcher tests (SURVEY.md §4a: DNN path golden tests).

onnxruntime is unavailable in this image, so the oracle checks are semantic:
self-matching must concentrate on the diagonal, known camera shifts must
appear as the correct cell displacement, and the matcher must honor the
reference's decode/threshold contract (dnnfeaturematcher.cpp:75-100).
"""

import numpy as np
import pytest

from mono_slam_framework_tpu.models.loftr import LoftrModel
from mono_slam_framework_tpu.models.onnx_reader import load_graph, op_census

from synthetic_world import PlaneWorld, lateral_trajectory

MODEL = "/root/reference/model/LoFTR_teacher.onnx"


@pytest.fixture(scope="module")
def model():
    return LoftrModel(MODEL)


@pytest.fixture(scope="module")
def rendered_pair():
    world = PlaneWorld(width=640, height=480, f=500.0, second_plane=(3.0, 0.3))
    poses = lateral_trajectory(4, step=0.2)
    return world.render(poses[0]), world.render(poses[2])


class TestOnnxReader:
    def test_graph_structure(self):
        g = load_graph(MODEL)
        assert g.inputs == ["img0", "img1"]
        census = op_census(g)
        # the reference model's op census (SURVEY.md §2 #17: ResNet-FPN
        # 21 convs + linear-attention blocks + dual softmax)
        assert census["Conv"] == 21
        assert census["Softmax"] == 2
        assert census["Elu"] == 16
        assert census["MatMul"] == 65
        # conv weights present and shaped
        w = g.initializers
        assert any(v.ndim == 4 for v in w.values())


class TestLoftrModel:
    def test_confidence_shape_and_range(self, model, rendered_pair):
        a, b = rendered_pair
        conf = np.asarray(model.confidence((a / 255.0)[None, None], (b / 255.0)[None, None]))
        assert conf.shape == (1, 1200, 1200)
        assert conf.min() >= 0.0 and conf.max() <= 1.0

    def test_self_match_diagonal(self, model, rendered_pair):
        a, _ = rendered_pair
        conf = np.asarray(
            model.confidence((a / 255.0)[None, None], (a / 255.0)[None, None])
        )[0]
        frac = (conf.argmax(axis=1) == np.arange(1200)).mean()
        assert frac > 0.9

    def test_shift_recovered(self, model, rendered_pair):
        a, b = rendered_pair
        conf = np.asarray(
            model.confidence((a / 255.0)[None, None], (b / 255.0)[None, None])
        )[0]
        strong = conf.max(axis=1) > 0.2
        assert strong.sum() > 5
        am = conf.argmax(axis=1)
        dx = (am % 40) - (np.arange(1200) % 40)
        # camera moved +x -> features shift -x; planes at z=3..5 with
        # f*t = 200 -> 2.5..4.2 cells
        med = np.median(dx[strong])
        assert -5 <= med <= -2, med


class TestLoftrMatcher:
    def test_match_frames_contract(self, model, rendered_pair):
        from mono_slam_framework_tpu.matchers.loftr_matcher import LoftrFeatureMatcher

        class F:
            def __init__(self, i, img):
                self.id, self.image, self.matcher_key = i, img, ("L", i)

        a, b = rendered_pair
        m = LoftrFeatureMatcher(threshold=0.15)
        res = m.match_frames(F(0, a), F(1, b))
        assert res.num_matches > 5
        assert res.keypoints1.dtype == np.int32
        # decoded coords are multiples of the 16px cell size
        assert (res.keypoints1 % 16 == 0).all()
        assert (res.keypoints2 % 16 == 0).all()
        # raising the threshold reduces matches (SetThreshold surface)
        m.set_threshold(0.5)
        res2 = m.match_frames(F(0, a), F(1, b))
        assert res2.num_matches <= res.num_matches
