"""Matcher A/B harness test on the mini-TUM dataset (ORB only on CPU —
LoFTR over a 24-frame sequence is too slow for the unit suite; its matcher
is covered by test_loftr.py)."""

import json

from test_runner import mini_tum  # fixture reuse  # noqa: F401


class TestABSweep:
    def test_orb_sweep_entry(self, mini_tum, tmp_path, capsys):  # noqa: F811
        from mono_slam_framework_tpu import ab_sweep

        root, world = mini_tum
        results = ab_sweep.main(
            [
                "--dataset", "tum",
                "--path", str(root),
                "--matchers", "orb",
                "--fx", str(world.f), "--fy", str(world.f),
                "--cx", str(world.cx), "--cy", str(world.cy),
                "--features", "400",
                "--ratio", "0.7",
                "--model-fallback",
                "--out-prefix", str(tmp_path / "ab"),
                "--ate",
            ]
        )
        assert len(results) == 1
        r = results[0]
        assert r["matcher"] == "orb"
        assert r["final_state"] == "OK"
        assert r["ate_rmse"] < 1.0  # harness-mechanics test; quality bounds live in test_pipeline
        assert "tracking" in r["stage_timing"]
        # valid printed JSON
        out = json.loads(capsys.readouterr().out)
        assert out["sweep"][0]["frames"] == 24

    def test_sharded_loftr_sweep_entry(self, mini_tum, tmp_path, capsys):  # noqa: F811
        """Mesh-sharded LoFTR pairwise sweep over the 8-device CPU mesh."""
        from mono_slam_framework_tpu import ab_sweep

        root, world = mini_tum
        results = ab_sweep.main(
            [
                "--dataset", "tum",
                "--path", str(root),
                "--matchers", "",
                "--sharded-loftr",
                "--max-frames", "9",
                "--fx", str(world.f), "--fy", str(world.f),
                "--cx", str(world.cx), "--cy", str(world.cy),
                "--out-prefix", str(tmp_path / "ab"),
            ]
        )
        assert len(results) == 1
        r = results[0]
        assert r["matcher"] == "loftr-sharded"
        assert r["devices"] == 8
        assert r["pairs"] == 8
        # consecutive frames of the same world must match
        assert r["mean_matches"] > 5
