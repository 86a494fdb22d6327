"""Persistent XLA compilation cache + AOT executable serialization.

Round-1 operational defect: every process start recompiled everything —
245 s for the batch-1 rollout in the driver bench, ~19 min engine warmup at
512² with batching over the TPU tunnel. Two mitigations, composable:

1. ``enable_persistent_cache()`` — JAX's on-disk compilation cache: the
   second process start loads compiled executables from disk instead of
   recompiling (works for every jit in the process, including Pallas
   kernels). Call it before the first compilation.

2. ``save_executable`` / ``load_executable`` — explicit AOT serialization of
   one lowered+compiled function (jax.experimental.serialize_executable),
   for pinning exact serving executables independent of cache eviction.

The reference has no equivalent (CUDA kernels ship precompiled; its torch
graphs rebuild per process, run.py:20-40).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

# repo-local by default (gitignored); override with MIDD_TPU_CACHE_DIR
DEFAULT_CACHE_DIR = os.environ.get(
    "MIDD_TPU_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".xla_cache"),
)


def enable_persistent_cache(
    cache_dir: Optional[str] = None, min_compile_secs: float = 0.5
) -> str:
    """Turn on JAX's persistent compilation cache. Idempotent; returns the
    cache directory in effect. A dir the PROCESS already configured (e.g.
    the test suite's conftest) is respected unless ``cache_dir`` is passed
    explicitly — enabling the cache as a constructor side effect must not
    clobber the embedding application's configuration."""
    current = getattr(jax.config, "jax_compilation_cache_dir", None)
    if cache_dir is None and current:
        return current
    d = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    # also cache XLA-internal autotuning/kernel caches where supported
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:  # noqa: BLE001 - option absent or backend-unsupported
        pass
    return d


def save_executable(compiled, path: str) -> None:
    """Serialize a ``jax.jit(f).lower(*args).compile()`` result to disk."""
    import pickle

    from jax.experimental import serialize_executable

    payload = serialize_executable.serialize(compiled)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_executable(path: str):
    """Load a serialized executable; returns the compiled callable.

    Caveat: deserialization targets the loading process's FULL addressable
    device set — serialize executables compiled for the same topology you
    will load on (single chip for serving; replicated-over-mesh for tests)."""
    import pickle

    from jax.experimental import serialize_executable

    with open(path, "rb") as f:
        payload = pickle.load(f)
    return serialize_executable.deserialize_and_load(*payload)
