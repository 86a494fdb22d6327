"""Model-zoo structural tests: parameter counts must equal the measured
reference counts (SURVEY.md section 2.2, BASELINE.md), shapes must round-trip.

Param-count equality is a strong whole-architecture check: every layer,
channel width, and bias flag must match for the totals to agree.
"""

import jax
import jax.numpy as jnp
import pytest

from midd_tpu import config
from midd_tpu.models import (
    EnhancedNAFNet,
    ExpertDenoiser,
    FusionModule,
    NoiseAnalyzer,
    TinyUNet,
    UNetDiffusion,
)


def n_params(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_unet_diffusion_param_count_and_shape(key):
    model = UNetDiffusion(config.SERVE_DIFFUSION)
    x = jnp.zeros((1, 64, 64, 1))
    t = jnp.zeros((1,), jnp.int32)
    variables = jax.jit(model.init)(key, x, x, t)
    assert n_params(variables["params"]) == 12_823_489  # DDIM/DDIMModel.py:168
    y = jax.jit(model.apply)(variables, x, x, t)
    assert y.shape == (1, 64, 64, 1)


def test_cddpm_unet_param_count_and_shape(key):
    model = UNetDiffusion(config.CDDPM_UNET)
    x = jnp.zeros((1, 64, 64, 1))
    t = jnp.zeros((1,), jnp.int32)
    variables = jax.jit(model.init)(key, x, x, t)
    assert n_params(variables["params"]) == 12_526_273  # cddpm/cddpmModels.py:176
    y = jax.jit(model.apply)(variables, x, x, t)
    assert y.shape == (1, 64, 64, 1)


def test_nafnet_param_count_and_residual(key):
    model = EnhancedNAFNet(config.SERVE_NAFNET)
    x = jnp.zeros((1, 64, 64, 1))
    variables = jax.jit(model.init)(key, x)
    assert n_params(variables["params"]) == 20_991_105  # NafNet/NafnetModel.py:232
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == (1, 64, 64, 1)


def test_nafnet_pads_odd_sizes(key):
    model = EnhancedNAFNet(config.SERVE_NAFNET)
    x = jnp.zeros((1, 50, 35, 1))
    variables = jax.jit(model.init)(key, x)
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == (1, 50, 35, 1)


def test_model2_nafnet_param_count(key):
    model = EnhancedNAFNet(config.MODEL2_NAFNET)
    x = jnp.zeros((1, 32, 32, 1))
    variables = jax.jit(model.init)(key, x)
    assert n_params(variables["params"]) == 10_803_361  # Backend/model2.py (SURVEY 2.4 #20)
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == (1, 32, 32, 1)


def test_expert_param_count(key):
    model = ExpertDenoiser(config.SERVE_EXPERT)
    x = jnp.zeros((1, 64, 64, 1))
    variables = jax.jit(model.init)(key, x)
    # torch's 7,629,185 counts trainable params only (weights+biases+BN affine);
    # BN running stats live in the separate batch_stats collection here.
    assert n_params(variables["params"]) == 7_629_185
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == (1, 64, 64, 1)


def test_router_param_count(key):
    model = NoiseAnalyzer(config.RouterConfig())
    x = jnp.zeros((1, 64, 64, 1))
    variables = jax.jit(model.init)(key, x)
    assert n_params(variables["params"]) == 374_497  # hybrid3diffusionspeed.py:470
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == (1, 64, 64, 1)
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0


def test_fusion_param_count(key):
    model = FusionModule(config.FusionConfig())
    x = jnp.zeros((1, 64, 64, 1))
    variables = jax.jit(model.init)(key, x, x, x)
    assert n_params(variables["params"]) == 11_905  # hybrid3diffusionspeed.py:537
    y = jax.jit(model.apply)(variables, x, x, x)
    assert y.shape == (1, 64, 64, 1)


def test_fusion_residual_variant(key):
    """TPU-native residual fusion (FusionConfig.residual): identical param
    tree to the reference head, but zero-init 1x1 correction ADDED to the
    NAFNet branch — at init the output IS the fast path exactly."""
    fast = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 1))
    hq = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 1))
    mask = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 1))

    res = FusionModule(config.FusionConfig(residual=True))
    v = jax.jit(res.init)(key, fast, hq, mask)
    assert n_params(v["params"]) == 11_905  # same tree as the plain head
    out = jax.jit(res.apply)(v, fast, hq, mask)
    assert jnp.allclose(out, fast), "residual head must start at identity"

    plain = FusionModule(config.FusionConfig())
    vp = jax.jit(plain.init)(key, fast, hq, mask)
    # the trees interchange structurally (drop-in checkpoints)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)


def test_tiny_unet_param_count(key):
    model = TinyUNet(config.TINY_UNET)
    x = jnp.zeros((1, 64, 64, 1))
    t = jnp.zeros((1,), jnp.int32)
    variables = jax.jit(model.init)(key, x, t, x)
    # measured from the reference TinyUNet (newfastmodel/modelfunctions.py:111)
    assert n_params(variables["params"]) == 784_929
    y = jax.jit(model.apply)(variables, x, t, x)
    assert y.shape == (1, 64, 64, 1)


def test_fusion_sees_expert_variant(key):
    """TPU-native expert-fed fusion: 4th input channel, residual identity
    still holds at init, and the plain 3-input call raises when the config
    demands the expert branch."""
    from midd_tpu.models.hybrid import hybrid_forward

    fast = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 1))
    hq = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 1))
    mask = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 1))
    exp = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 1))

    m = FusionModule(config.FusionConfig(residual=True, sees_expert=True))
    v = jax.jit(m.init)(key, fast, hq, mask, exp)
    # in_c=4: first conv kernel carries one extra input channel
    assert v["params"]["conv1_0"]["kernel"].shape[2] == 4
    out = jax.jit(m.apply)(v, fast, hq, mask, exp)
    assert jnp.allclose(out, fast)  # residual zero-init identity

    with pytest.raises(ValueError, match="expert branch"):
        m.apply(v, fast, hq, mask)

    # hybrid_forward threads the expert branch through (sanitized, frozen)
    out2 = hybrid_forward(
        lambda x: fast,
        lambda x: hq,
        lambda x: mask,
        lambda *ins: m.apply(v, *ins),
        jnp.zeros((1, 16, 16, 1)),
        expert_apply=lambda x: exp,
    )
    assert jnp.allclose(out2, jnp.clip(fast, 0, 1))
