"""Test harness configuration.

Tests run on XLA:CPU with a virtual 8-device mesh so the full multi-chip
sharding path compiles and executes without TPU hardware (the same XLA graphs
lower to TPU unchanged).

Note: this environment's sitecustomize force-registers the axon TPU backend
and programmatically sets ``jax_platforms="axon,cpu"`` — a plain
``JAX_PLATFORMS=cpu`` env var is ignored, so we override the config directly
before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
