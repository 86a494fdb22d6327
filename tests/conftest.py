"""Test harness config.

Tests run on CPU with 8 virtual XLA devices so sharding/collective code paths
are exercised without TPU hardware (SURVEY.md section 4 test strategy). These
env vars MUST be set before jax initialises its backends, hence here.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# This image's JAX build defaults matmuls/convs to low precision even on CPU;
# parity tests need exact fp32 numerics.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(42)
