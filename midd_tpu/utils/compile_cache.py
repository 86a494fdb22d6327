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


def aot_fingerprint(**kwargs) -> str:
    """Stable hex key for one pinned executable: caller-provided identity
    (model/arch/shape/steps/eps/dtype) + jax version + device kind. Any
    change recompiles rather than loading a stale binary."""
    import hashlib
    import json

    import jax as _jax

    ident = dict(kwargs)
    ident["jax_version"] = _jax.__version__
    ident["device_kind"] = _jax.devices()[0].device_kind
    ident["n_devices"] = len(_jax.devices())
    blob = json.dumps(ident, sort_keys=True, default=repr)
    return hashlib.sha256(blob.encode()).hexdigest()[:20]


def pin_or_load(jit_fn, example_args, path: str):
    """Return a compiled executable for ``jit_fn`` at ``example_args``'
    shapes: loaded from ``path`` when a valid pin exists, else compiled via
    ``jit_fn.lower(...).compile()`` and serialized to ``path``.

    Returns (compiled, loaded: bool). A loaded pin is VALIDATED by executing
    it once on zeros and materialising the result — deserialization can
    "succeed" yet fail at run time (observed: XLA:CPU thunk reload missing
    fused functions; cross-host feature mismatches). Any failure falls back
    to compile-and-overwrite — pinning is an optimization, never a
    correctness dependency."""
    import numpy as np

    if os.path.exists(path):
        try:
            loaded = load_executable(path)
            out = loaded(*example_args)
            jax.tree_util.tree_map(np.asarray, out)  # forced materialisation
            return loaded, True
        except Exception:  # noqa: BLE001 - stale/broken pin; recompile below
            pass
    compiled = jit_fn.lower(*example_args).compile()
    try:
        save_executable(compiled, path)
    except Exception:  # noqa: BLE001 - serialization unsupported on backend
        pass
    return compiled, False


class AotDispatch:
    """Serve pinned executables per leading-batch size, falling back to the
    original jit function for any other shape (so ad-hoc callers — tests,
    odd batch sizes — still work).

    A pinned executable that FAILS at execution (deserialization gaps vary
    by backend: e.g. XLA:CPU thunk reload can miss fused functions) is
    dropped permanently and its shape falls back to jit — pinning is an
    optimization, never a correctness dependency."""

    def __init__(self, jit_fn, execs, bound_args=()):
        self._jit_fn = jit_fn
        self._execs = dict(execs)  # {batch: compiled}
        # leading arguments bound at dispatch time (e.g. the weights tree —
        # passed as jit ARGUMENTS so they are not baked into programs)
        self._bound = tuple(bound_args)

    def __call__(self, x):
        b = int(x.shape[0])
        e = self._execs.get(b)
        if e is None:
            return self._jit_fn(*self._bound, x)
        import jax.numpy as jnp

        try:
            return e(*self._bound, jnp.asarray(x))
        except Exception:  # noqa: BLE001 - broken pin: heal to jit
            del self._execs[b]
            return self._jit_fn(*self._bound, x)
