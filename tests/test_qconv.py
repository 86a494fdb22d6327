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


def test_qconv_static_mode_matches_dynamic(rng):
    """Calibrated-static quantization is as accurate as dynamic on inputs
    inside the calibrated range (the serving case: scales frozen offline,
    no per-call reduction)."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8), dtype=np.float32))
    ref = tconv(12, 3)
    dyn = tconv(12, 3, quant=True)
    cal = tconv(12, 3, quant="calibrate")
    sta = tconv(12, 3, quant="static")
    params = ref.init(jax.random.PRNGKey(1), x)

    # calibration records the abs-max AND returns the exact fp32 conv
    y_cal, mut = cal.apply(params, x, mutable=["qscales"])
    yr = np.asarray(ref.apply(params, x))
    np.testing.assert_allclose(np.asarray(y_cal), yr, atol=1e-5)
    absmax = float(jax.tree_util.tree_leaves(mut["qscales"])[0])
    assert absmax == pytest.approx(float(jnp.max(jnp.abs(x))))

    yq_s = np.asarray(sta.apply({**params, "qscales": mut["qscales"]}, x))
    yq_d = np.asarray(dyn.apply(params, x))
    # same scale -> identical quantization on the calibration input
    np.testing.assert_allclose(yq_s, yq_d, atol=1e-5)

    # running max accumulates across calibration batches
    x2 = x * 3.0
    _, mut2 = cal.apply(
        {**params, "qscales": mut["qscales"]}, x2, mutable=["qscales"]
    )
    absmax2 = float(jax.tree_util.tree_leaves(mut2["qscales"])[0])
    assert absmax2 == pytest.approx(3.0 * absmax, rel=1e-5)


def test_qconv_static_without_calibration_raises(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
    sta = tconv(6, 3, quant="static")
    params = tconv(6, 3).init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="calibrate"):
        sta.apply(params, x)


def test_static_int8_engine_close_to_fp(tmp_path):
    """The static-int8 engine (calibration at startup) stays close to the
    full-precision engine on both quantized paths. Quality ADOPTION is gated
    on xraybench (PARITY.md); this is the wiring correctness check."""
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    tiny = dict(
        img_size=32,
        diffusion_cfg=config.DiffusionUNetConfig(
            model_channels=8, channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(1,), time_emb_dim=16,
        ),
        nafnet_cfg=config.NAFNetConfig(
            width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)
        ),
        expert_cfg=config.ExpertConfig(base_channels=8),
        router_cfg=config.RouterConfig(base_c=8),
        fusion_cfg=config.FusionConfig(base_c=16),
        diffusion_steps=4,
        hybrid_diffusion_steps=4,
        ckpt_dir=str(tmp_path / "none"),
        warmup=False,
        persistent_cache=False,
    )
    e_fp = InferenceEngine(EngineConfig(**tiny))
    e_q = InferenceEngine(EngineConfig(quantize_int8="static", **tiny))
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.clip(rng.random((1, 32, 32, 1)), 0, 1).astype(np.float32))
    for name in ("diffusion", "hybrid"):
        yr = np.asarray(e_fp.fns[name](x))
        yq = np.asarray(e_q.fns[name](x))
        c = np.corrcoef(yr.ravel(), yq.ravel())[0, 1]
        assert c > 0.995, (name, c)
        assert np.abs(yq - yr).max() < 0.1


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
