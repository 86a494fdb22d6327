"""Persistent-cache + AOT serialization helpers (utils/compile_cache.py)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from midd_tpu.utils.compile_cache import (
    enable_persistent_cache,
    load_executable,
    save_executable,
)


def test_enable_persistent_cache_sets_config(tmp_path):
    d = enable_persistent_cache(str(tmp_path / "xla"))
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # restore the test-suite cache dir (conftest points it at tests/.jax_cache)
    enable_persistent_cache(
        os.path.join(os.path.dirname(__file__), ".jax_cache")
    )


def test_aot_save_load_executable_roundtrip(tmp_path, rng):
    from midd_tpu.parallel import make_mesh, replicated

    x = jnp.asarray(rng.standard_normal((4, 8), dtype=np.float32))
    # deserialize_and_load targets ALL addressable devices (8 on the test
    # mesh), so the executable must be compiled for that device set — here
    # fully replicated. Single-chip serving (the real AOT use) has one device.
    s = replicated(make_mesh(len(jax.devices())))

    def f(a):
        return jnp.tanh(a) @ a.T

    compiled = jax.jit(f, in_shardings=s, out_shardings=s).lower(x).compile()
    path = str(tmp_path / "exec.pkl")
    save_executable(compiled, path)
    assert os.path.getsize(path) > 0
    loaded = load_executable(path)
    np.testing.assert_allclose(
        np.asarray(loaded(jax.device_put(x, s))), np.asarray(compiled(x)), atol=0
    )
