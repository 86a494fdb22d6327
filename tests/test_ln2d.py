"""Equivalence tests for the (unadopted, kept-as-infrastructure) fused
LayerNorm2d Pallas kernel — see midd_tpu/ops/ln2d.py for why the product
path stays XLA. Runs in interpret mode on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midd_tpu.ops.ln2d import _ln2d_xla, ln2d_fused, supported


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize(
    "shape",
    [
        (2, 8, 8, 32),   # lane-native path, fold-4 width
        (1, 4, 4, 64),   # lane-native, fold-2 width
        (1, 5, 3, 48),   # lane-native, odd spatial + non-divisor C
        (2, 4, 4, 128),  # row path
        (2, 4, 2, 512),  # row path, middle-block width
    ],
)
def test_ln2d_kernel_matches_xla(rng, shape):
    c = shape[-1]
    x = jnp.asarray(rng.random(shape).astype(np.float32) * 3 + 1)
    scale = jnp.asarray(rng.random(c).astype(np.float32))
    bias = jnp.asarray(rng.random(c).astype(np.float32))
    assert supported(x)
    np.testing.assert_allclose(
        np.asarray(ln2d_fused(x, scale, bias)),
        np.asarray(_ln2d_xla(x, scale, bias, 1e-6)),
        atol=1e-5,
    )


def test_ln2d_kernel_bf16(rng):
    x = jnp.asarray(rng.random((2, 8, 8, 32)).astype(np.float32) * 2 + 1)
    scale = jnp.asarray(rng.random(32).astype(np.float32))
    bias = jnp.asarray(rng.random(32).astype(np.float32))
    got = ln2d_fused(x.astype(jnp.bfloat16), scale, bias)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got.astype(jnp.float32)),
        np.asarray(_ln2d_xla(x.astype(jnp.bfloat16), scale, bias, 1e-6)
                   .astype(jnp.float32)),
        atol=1e-5,
    )


def test_ln2d_gradients_match_xla(rng):
    x = jnp.asarray(rng.random((1, 4, 4, 32)).astype(np.float32) * 2 + 1)
    scale = jnp.asarray(rng.random(32).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.random(32).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(jnp.sin(ln2d_fused(x, s, b)))

    def loss_xla(x, s, b):
        return jnp.sum(jnp.sin(_ln2d_xla(x, s, b, 1e-6)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_supported_gate():
    assert supported(jnp.zeros((1, 4, 4, 32)))
    assert supported(jnp.zeros((1, 4, 4, 127)))  # narrow: any C
    assert supported(jnp.zeros((1, 4, 4, 256)))
    assert not supported(jnp.zeros((1, 4, 4, 192)))  # wide non-multiple
