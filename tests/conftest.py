"""Test harness config.

Tests run on CPU with 8 virtual XLA devices so sharding/collective code paths
are exercised without TPU hardware (SURVEY.md section 4 test strategy). These
env vars MUST be set before jax initialises its backends, hence here.
"""

import os

# Force the CPU backend: the outer environment points JAX at the remote TPU
# tunnel (JAX_PLATFORMS=axon), which makes per-op dispatch a network RPC.
os.environ["JAX_PLATFORMS"] = "cpu"
# torch's OpenMP runtime deadlocks XLA-CPU compilation in this image when both
# are multi-threaded in one process; parity tests need both libraries.
os.environ["OMP_NUM_THREADS"] = "1"
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"  # no tunnel round-trips from tests
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Import torch BEFORE jax and force its thread-pool init with a real op:
# initializing jax's XLA-CPU runtime first and importing torch afterwards
# deadlocks the next jax dispatch in this image (OpenMP runtime clash).
import torch  # noqa: E402

torch.set_num_threads(1)
_ = (torch.zeros(2) + 1).sum().item()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The jaxtyping pytest plugin imports jax BEFORE this conftest runs, so jax may
# have captured JAX_PLATFORMS=axon from the outer env already; override the
# live config too (must happen before first backend use).
jax.config.update("jax_platforms", "cpu")

# This image's JAX build defaults matmuls/convs to low precision even on CPU;
# parity tests need exact fp32 numerics.
jax.config.update("jax_default_matmul_precision", "highest")

# Per-op XLA-CPU compiles take ~1-3s in this build; cache compilations across
# test runs and prefer jitted whole-model applies in tests.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
