"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestShardedSweep:
    def test_matcher_sweep_over_mesh(self):
        from mono_slam_framework_tpu.parallel import make_mesh, sharded_matcher_sweep

        mesh = make_mesh(8)
        assert mesh.devices.size == 8
        rng = np.random.default_rng(0)
        B, H, W = 16, 64, 96
        base = np.kron(rng.uniform(0, 255, (H // 8, W // 8)), np.ones((8, 8)))
        imgs1 = jnp.asarray(
            np.stack([np.roll(base, i, 1) for i in range(B)]), jnp.float32
        )
        imgs2 = jnp.asarray(
            np.stack([np.roll(base, i + 3, 1) for i in range(B)]), jnp.float32
        )
        xy1, xy2, ok = sharded_matcher_sweep(mesh, imgs1, imgs2, max_features=64)
        assert xy1.shape[0] == B
        assert bool(ok.any())
        # every shard produced some matches (shifted copies of the same image)
        per_item = np.asarray(ok).sum(axis=1)
        assert (per_item > 0).mean() > 0.8

    def test_loftr_tensor_parallel_matches_single_device(self):
        """Token-sharded transformer + cross-shard dual softmax == reference."""
        from mono_slam_framework_tpu.models import loftr_native
        from mono_slam_framework_tpu.parallel import loftr_tp_confidence, make_mesh

        params = loftr_native.load_params()
        rng = np.random.default_rng(1)
        f0 = jnp.asarray(rng.normal(size=(1, 1200, 32)).astype(np.float32))
        f1 = jnp.asarray(rng.normal(size=(1, 1200, 32)).astype(np.float32))
        ref = np.asarray(loftr_native.confidence_from_features(params, f0, f1))
        tp = np.asarray(loftr_tp_confidence(make_mesh(8), params, f0, f1))
        assert np.abs(ref - tp).max() < 1e-5

    def test_loftr_data_parallel_sweep(self):
        """A batch of encoded pairs sharded over the mesh: per-pair top-k
        must match the single-device matcher on each pair."""
        from mono_slam_framework_tpu.models import loftr_native
        from mono_slam_framework_tpu.parallel import make_mesh, sharded_loftr_sweep

        params = loftr_native.load_params()
        rng = np.random.default_rng(2)
        B = 8
        f1 = jnp.asarray(rng.normal(size=(B, 1200, 32)).astype(np.float32))
        f2 = jnp.asarray(rng.normal(size=(B, 1200, 32)).astype(np.float32))
        vals, idx = sharded_loftr_sweep(make_mesh(8), f1, f2, max_matches=16)
        assert vals.shape == (B, 16) and idx.shape == (B, 16)
        rv, ri = loftr_native.match_features_topk(
            params, f1[3:4], f2[3:4], 16
        )
        assert np.allclose(np.asarray(vals)[3], np.asarray(rv)[0], atol=1e-6)
        assert np.array_equal(np.asarray(idx)[3], np.asarray(ri)[0])

    def test_graft_entry_dryrun(self):
        spec = importlib.util.spec_from_file_location(
            "graft_entry", "/root/repo/__graft_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)  # must compile + execute on the 8-device mesh

    def test_graft_entry_single(self):
        spec = importlib.util.spec_from_file_location(
            "graft_entry", "/root/repo/__graft_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        # steady_step returns (Features, packed, chain_px, chain_row, T2)
        assert np.isfinite(np.asarray(out[1])).all()
        assert np.isfinite(np.asarray(out[4])).all()


class TestShardedGlobalBA:
    def test_matches_single_device_cg(self):
        """Edge-sharded PCG global BA must numerically match the
        single-device cg path (psum of partial segment sums is the full
        reduction; identical LM schedule)."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_optim import make_ba_problem, K

        from mono_slam_framework_tpu.optim.bundle_adjust import (
            build_problem,
            global_bundle_adjust,
        )
        from mono_slam_framework_tpu.parallel import (
            global_bundle_adjust_sharded,
            make_ba_mesh,
        )
        from mono_slam_framework_tpu.geometry import se3  # noqa: F401

        rng = np.random.default_rng(11)
        cams_true, cams0, fixed, X, X0, e_cam, e_pt, e_uv = make_ba_problem(
            rng, n_cams=6, n_pts=120
        )
        p = build_problem(
            np.stack(cams0).astype(np.float32), fixed, X0.astype(np.float32),
            e_cam, e_pt, e_uv.astype(np.float32), K, with_pairs=False,
        )
        T1, X1, chi1 = global_bundle_adjust(p, n_iters=8, cg_iters=40)
        mesh = make_ba_mesh()
        T2, X2, chi2 = global_bundle_adjust_sharded(
            mesh, p, n_iters=8, cg_iters=40
        )
        assert np.allclose(np.asarray(chi1), np.asarray(chi2), rtol=1e-3)
        assert np.abs(np.asarray(T1) - np.asarray(T2)).max() < 1e-3
        assert np.abs(np.asarray(X1) - np.asarray(X2)).max() < 1e-2
        # and it actually solved the problem: cameras near ground truth
        for c in range(len(cams_true)):
            if not fixed[c]:
                assert (
                    np.abs(np.asarray(T2)[c] - cams_true[c]).max() < 0.05
                )
