"""Space-to-depth stage-0 NAFNet layout: same param tree, same numbers
(ops/naf_s2d.py — layout is internal; checkpoints interchange)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midd_tpu import config
from midd_tpu.models import EnhancedNAFNet
from midd_tpu.ops.naf_s2d import ds2, s2d

TINY = config.NAFNetConfig(
    width=8, middle_blk_num=1, enc_blk_nums=(1, 2), dec_blk_nums=(1, 1)
)


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 6, 5), dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(ds2(s2d(x))), np.asarray(x))
    # phase-major lane order: lane = phase*C + c, phase = 2*dy + dx
    y = np.asarray(s2d(x))
    assert y.shape == (2, 4, 3, 20)
    np.testing.assert_array_equal(y[0, 0, 0, 5:10], np.asarray(x)[0, 0, 1, :])
    np.testing.assert_array_equal(y[0, 0, 0, 10:15], np.asarray(x)[0, 1, 0, :])


@pytest.mark.parametrize("cfg", [TINY, config.NAFNetConfig(
    width=8, middle_blk_num=1, enc_blk_nums=(1,), dec_blk_nums=(1,))])
def test_s2d_param_tree_matches_plain(cfg):
    plain = EnhancedNAFNet(cfg)
    s2dm = EnhancedNAFNet(cfg, s2d_stage0=True)
    x = jnp.zeros((1, 32, 32, 1))
    sp = jax.eval_shape(lambda: plain.init(jax.random.PRNGKey(0), x))
    ss = jax.eval_shape(lambda: s2dm.init(jax.random.PRNGKey(0), x))
    flat_p = {
        jax.tree_util.keystr(k): (tuple(v.shape), v.dtype)
        for k, v in jax.tree_util.tree_flatten_with_path(sp)[0]
    }
    flat_s = {
        jax.tree_util.keystr(k): (tuple(v.shape), v.dtype)
        for k, v in jax.tree_util.tree_flatten_with_path(ss)[0]
    }
    assert flat_p == flat_s


@pytest.mark.parametrize("hw", [(32, 32), (48, 36)])  # even + padder cases
def test_s2d_forward_equivalent(rng, hw):
    plain = EnhancedNAFNet(TINY)
    s2dm = EnhancedNAFNet(TINY, s2d_stage0=True)
    x = jnp.asarray(
        rng.random((2, hw[0], hw[1], 1), dtype=np.float32) * 0.8 + 0.1
    )
    variables = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
    # zero-init residual scales (beta/gamma) make blocks near-identity;
    # perturb the whole tree so every path carries real signal
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 * np.random.default_rng(1).standard_normal(v.shape
                                                                      ).astype(v.dtype),
        variables,
    )
    a = np.asarray(jax.jit(plain.apply)(variables, x))
    b = np.asarray(jax.jit(s2dm.apply)(variables, x))
    np.testing.assert_allclose(a, b, atol=5e-5)


def test_s2d_engine_paths_equal(rng):
    """EngineConfig.nafnet_s2d serves identical outputs on the nafnet AND
    hybrid paths (both NAFNet instances switch layout; weights unchanged)."""
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    kw = dict(
        img_size=32,
        diffusion_steps=2,
        hybrid_diffusion_steps=2,
        nafnet_cfg=TINY,
        diffusion_cfg=config.DiffusionUNetConfig(
            model_channels=8, channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(1,), time_emb_dim=16,
        ),
        expert_cfg=config.ExpertConfig(base_channels=8),
        router_cfg=config.RouterConfig(base_c=8),
        fusion_cfg=config.FusionConfig(base_c=16),
        schedule_cfg=config.ScheduleConfig(noise_steps=6),
        ckpt_dir="/nonexistent",
        warmup=False,
        diffusion_eval_bf16=False,  # exact-equality pins fp32
        hybrid_rollout_bf16=False,
    )
    plain = InferenceEngine(EngineConfig(**kw))
    s2de = InferenceEngine(EngineConfig(nafnet_s2d=True, **kw))
    x = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    for name in ("nafnet", "hybrid"):
        a = np.asarray(plain.fns[name](x))
        b = np.asarray(s2de.fns[name](x))
        np.testing.assert_allclose(a, b, atol=5e-5, err_msg=name)


def test_s2d_serving_preset_equivalent(rng):
    """The shipped preset (width 32, 4 stages) at a small spatial size."""
    plain = EnhancedNAFNet(config.SERVE_NAFNET)
    s2dm = EnhancedNAFNet(config.SERVE_NAFNET, s2d_stage0=True)
    x = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
    variables = jax.jit(plain.init)(jax.random.PRNGKey(3), x)
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 * np.random.default_rng(2).standard_normal(v.shape
                                                                      ).astype(v.dtype),
        variables,
    )
    a = np.asarray(jax.jit(plain.apply)(variables, x))
    b = np.asarray(jax.jit(s2dm.apply)(variables, x))
    np.testing.assert_allclose(a, b, atol=5e-5)
