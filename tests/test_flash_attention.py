"""Flash-attention kernel equivalence vs the exact XLA path (interpret mode
on CPU; the same kernel code compiles via Mosaic on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from midd_tpu.ops.attention import mha_reference
from midd_tpu.ops.flash_attention import mha_flash, supported


@pytest.mark.parametrize("n,d", [(512, 96), (1024, 64)])
def test_flash_matches_reference(rng, n, d):
    q = jnp.asarray(rng.standard_normal((1, n, 2, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, n, 2, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, n, 2, d), dtype=np.float32))
    assert supported(q)
    ours = np.asarray(mha_flash(q, k, v))
    ref = np.asarray(mha_reference(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_flash_fallback_on_odd_shapes(rng):
    # N=100 not divisible by blocks -> silently uses the exact path
    q = jnp.asarray(rng.standard_normal((1, 100, 2, 32), dtype=np.float32))
    out = mha_flash(q, q, q)
    ref = mha_reference(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
