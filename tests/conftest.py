"""Test harness configuration.

Tests run on XLA:CPU with a virtual 8-device mesh so the full multi-chip
sharding path compiles and executes without TPU hardware (the same XLA graphs
lower to TPU unchanged). This must happen before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
