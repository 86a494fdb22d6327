"""Dynamic-int8 QuantConv: param-tree compatibility with nn.Conv, bounded
quantization error, and the quantized UNet staying close to full precision."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from midd_tpu import config
from midd_tpu.models import UNetDiffusion
from midd_tpu.models.blocks import tconv
from midd_tpu.ops.qconv import QuantConv


def test_qconv_param_tree_matches_nn_conv(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8), dtype=np.float32))
    ref = tconv(12, 3)
    q = tconv(12, 3, quant=True)
    assert isinstance(q, QuantConv)
    pr = ref.init(jax.random.PRNGKey(0), x)["params"]
    pq = q.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pr) == jax.tree_util.tree_structure(pq)
    for a, b in zip(jax.tree_util.tree_leaves(pr), jax.tree_util.tree_leaves(pq)):
        assert a.shape == b.shape and a.dtype == b.dtype


@pytest.mark.parametrize("kernel,stride", [(3, 1), (1, 1), (3, 2)])
def test_qconv_error_bounded(rng, kernel, stride):
    """int8 output within the expected quantization error of the fp32 conv."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8), dtype=np.float32))
    ref = tconv(12, kernel, stride=stride)
    q = tconv(12, kernel, stride=stride, quant=True)
    params = ref.init(jax.random.PRNGKey(1), x)
    yr = np.asarray(ref.apply(params, x))
    yq = np.asarray(q.apply(params, x))
    # relative error of a 9*8-term int8 dot is well under 2% of the dynamic
    # range for standard-normal inputs
    scale = np.abs(yr).max()
    assert np.abs(yq - yr).max() < 0.02 * scale + 1e-3
    # and the outputs are strongly correlated
    c = np.corrcoef(yr.ravel(), yq.ravel())[0, 1]
    assert c > 0.999


def test_quant_unet_same_params_and_close_output(rng):
    cfg = config.DiffusionUNetConfig(
        model_channels=8, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(1,), time_emb_dim=16,
    )
    x = jnp.asarray(
        np.clip(rng.random((1, 16, 16, 1), dtype=np.float32), 0, 1)
    )
    t = jnp.zeros((1,), jnp.int32)
    m = UNetDiffusion(cfg)
    mq = UNetDiffusion(cfg, quant=True)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x, x, t)
    # identical param tree -> any checkpoint loads into the quantized model
    vq = jax.jit(mq.init)(jax.random.PRNGKey(0), x, x, t)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vq)

    yr = np.asarray(m.apply(v, x, x, t))
    yq = np.asarray(mq.apply(v, x, x, t))
    assert yq.shape == yr.shape
    # compounded int8 error through the quantized ResBlocks stays bounded
    # (quality adoption is gated on the benchmark, not this smoke tolerance)
    c = np.corrcoef(yr.ravel(), yq.ravel())[0, 1]
    assert c > 0.99
    assert np.abs(yq - yr).max() < 0.15 * max(np.abs(yr).max(), 1e-3)
