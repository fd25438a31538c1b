"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU chip is reserved for bench.py; tests validate numerics and
multi-chip sharding on CPU (reference test strategy: SURVEY.md §4 — the
reference has no tests, so this suite is built from scratch).
"""

import os

# Force CPU even if the ambient environment points at a TPU: unit tests must
# not occupy the real chip. The axon sitecustomize imports jax at interpreter
# startup, so env vars are too late — flip the config knob instead (valid as
# long as no backend has been initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, "tests expect an 8-device virtual CPU mesh"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
