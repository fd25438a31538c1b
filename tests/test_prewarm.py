"""Background shape prewarming (utils/prewarm.py)."""

import time

import jax
import jax.numpy as jnp


class TestPrewarm:
    def test_cpu_auto_mode_is_noop(self):
        """Auto mode must skip on the CPU backend: its in-process compiler
        is not safe concurrently with main-thread compiles (segfault), and
        there is no relay executable load to hide."""
        from mono_slam_framework_tpu.utils.prewarm import prewarm

        @jax.jit
        def h(x):
            return x - 1.0

        if jax.default_backend() == "cpu":
            assert prewarm(h, jax.ShapeDtypeStruct((5,), jnp.float32)) is False

    def test_compiles_in_background_and_dedups(self):
        from mono_slam_framework_tpu.utils import prewarm as pw
        from mono_slam_framework_tpu.utils.prewarm import pending, prewarm

        @jax.jit
        def f(x):
            return x * 2.0 + 1.0

        pw.set_execute(False)  # pin compile-only so the CPU backend runs it
        try:
            spec = jax.ShapeDtypeStruct((37,), jnp.float32)
            assert prewarm(f, spec) is True
            assert prewarm(f, spec) is False  # same shapes -> deduplicated
            assert prewarm(f, jax.ShapeDtypeStruct((64,), jnp.float32)) is True
            for _ in range(60):
                if pending() == 0:
                    break
                time.sleep(0.25)
            assert pending() == 0
            # the real call works (and hits the compile cache)
            out = f(jnp.ones(37, jnp.float32))
            assert out.shape == (37,)
        finally:
            pw.set_execute(None)

    def test_execute_mode_populates_dispatch_cache(self):
        """Execute-mode prewarm (the TPU default) must leave the real call a
        plain jit dispatch-cache hit — that is the whole point: compile-only
        prewarming still pays the ~1.5 s executable load through the relay."""
        from mono_slam_framework_tpu.utils import prewarm as pw

        @jax.jit
        def g(x, y):
            return x @ x.T + y

        pw.set_execute(True)
        try:
            spec = jax.ShapeDtypeStruct((8, 8), jnp.float32)
            assert pw.prewarm(g, spec, 1.0) is True
            for _ in range(120):
                if pw.pending() == 0:
                    break
                time.sleep(0.25)
            assert pw.pending() == 0
            time.sleep(0.5)  # worker may still be inside the traced call
            n_before = g._cache_size()
            assert n_before == 1  # the background execution traced+cached it
            out = g(jnp.ones((8, 8), jnp.float32), 1.0)
            assert out.shape == (8, 8)
            assert g._cache_size() == n_before  # real call: cache HIT
        finally:
            pw.set_execute(None)

    def test_local_ba_spec_lowerable(self):
        """The abstract BAProblem spec must lower through the real solver."""
        from mono_slam_framework_tpu.optim import local_bundle_adjust
        from mono_slam_framework_tpu.slam.device_io import _ba_spec

        lowered = local_bundle_adjust.lower(_ba_spec(8, 128, 128, 512))
        assert lowered is not None

    def test_pipeline_with_prewarm_and_pipelined(self):
        """End-to-end: prewarmShapes + pipelined tracking stay OK on the
        synthetic world (the prewarm worker must not disturb real calls)."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        import numpy as np
        from synthetic_world import PlaneWorld, lateral_trajectory

        from mono_slam_framework_tpu.matchers import OrbFeatureMatcher
        from mono_slam_framework_tpu.params import SlamParameters
        from mono_slam_framework_tpu.slam import KeyFrameMatchDatabase, System
        from mono_slam_framework_tpu.slam.frame import reset_frame_ids
        from mono_slam_framework_tpu.slam.map_model import reset_map_ids

        world = PlaneWorld(second_plane=(3.0, 0.3))
        poses = lateral_trajectory(14, step=0.07)
        reset_frame_ids()
        reset_map_ids()
        params = SlamParameters(
            fx=world.f, fy=world.f, cx=world.cx, cy=world.cy,
            max_features=400, minIniMatchCount=100,
            initializerModelFallback=True, fusedTracking=True,
            fusedOneStep=True, prewarmShapes=True,
        )
        matcher = OrbFeatureMatcher(threshold=0.7, max_features=400)
        system = System(
            params, matcher, KeyFrameMatchDatabase(matcher), verbose=False
        )
        system.toggle_initialization_allowed()
        for i, T in enumerate(poses):
            system.track_monocular_pipelined(world.render(T), i * 0.1)
        final = system.flush_pipeline()
        assert final is not None and final["state"] == "OK"
        assert system.map.n_keyframes() >= 2
