"""Background shape prewarming (utils/prewarm.py)."""

import time

import jax
import jax.numpy as jnp


class TestPrewarm:
    def test_compiles_in_background_and_dedups(self):
        from mono_slam_framework_tpu.utils.prewarm import pending, prewarm

        calls = []

        @jax.jit
        def f(x):
            return x * 2.0 + 1.0

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

    def test_local_ba_spec_lowerable(self):
        """The abstract BAProblem spec must lower through the real solver."""
        from mono_slam_framework_tpu.optim import local_bundle_adjust
        from mono_slam_framework_tpu.slam.device_io import _ba_spec

        lowered = local_bundle_adjust.lower(_ba_spec(8, 128, 128, 512))
        assert lowered is not None
