"""Fused NAFBlock-FFN Pallas kernel equivalence vs the unfused math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midd_tpu.ops.naf_ffn import naf_ffn_fused


def _reference(y, scale, bias, w4, b4, w5, b5, gamma):
    x = y.astype(jnp.float32)
    u = x.mean(-1, keepdims=True)
    s = jnp.mean(jnp.square(x - u), axis=-1, keepdims=True)
    xn = (x - u) / jnp.sqrt(s + 1e-6) * scale + bias
    h = jnp.einsum("bhwc,cd->bhwd", xn, w4) + b4
    c2 = h.shape[-1] // 2
    g = h[..., :c2] * h[..., c2:]
    out = jnp.einsum("bhwc,cd->bhwd", g, w5) + b5
    return y + out * gamma


@pytest.mark.parametrize("c", [32, 128, 192])
def test_naf_ffn_fused_matches_reference(rng, c):
    y = jnp.asarray(rng.standard_normal((2, 8, 9, c)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    w4 = jnp.asarray(rng.standard_normal((c, 2 * c)).astype(np.float32) * 0.1)
    b4 = jnp.asarray(rng.standard_normal(2 * c).astype(np.float32) * 0.1)
    w5 = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.1)
    b5 = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    gamma = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)

    ours = np.asarray(naf_ffn_fused(y, scale, bias, w4, b4, w5, b5, gamma, block_rows=64))
    ref = np.asarray(_reference(y, scale, bias, w4, b4, w5, b5, gamma))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.parametrize("variant", ["standard", "model2"])
def test_nafnet_apply_fused_matches_module(rng, variant):
    """The kernel-fused functional forward must equal EnhancedNAFNet.apply."""
    from midd_tpu import config
    from midd_tpu.models import EnhancedNAFNet
    from midd_tpu.ops.naf_fast import nafnet_apply_fused

    if variant == "standard":
        cfg = config.NAFNetConfig(
            width=16, middle_blk_num=2, enc_blk_nums=(1, 2), dec_blk_nums=(1, 1)
        )
    else:  # model2 branches: multiscale intro + additive skips
        cfg = config.NAFNetConfig(
            width=16, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1),
            multiscale_intro=True, additive_skips=True,
        )
    model = EnhancedNAFNet(cfg)
    x = jnp.asarray(np.clip(rng.random((1, 24, 20, 1), dtype=np.float32), 0, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    ref = np.asarray(jax.jit(model.apply)(variables, x))
    fused = np.asarray(
        jax.jit(lambda p, a: nafnet_apply_fused(p, cfg, a))(variables["params"], x)
    )
    np.testing.assert_allclose(fused, ref, atol=5e-4)
