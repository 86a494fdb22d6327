"""Golden parity tests: reference PyTorch modules (random weights) vs the
midd_tpu re-implementations with converted weights, on identical inputs.

This is the correctness oracle from SURVEY.md section 4(b). Everything runs in
fp32 on CPU; tolerances are tight (1e-4 absolute on unit-scale activations).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from tests.torch_ref import load_reference

from midd_tpu import config
from midd_tpu.convert.torch_import import convert_state_dict
from midd_tpu.models import (
    EnhancedNAFNet,
    ExpertDenoiser,
    FusionModule,
    NoiseAnalyzer,
    TinyUNet,
    UNetDiffusion,
)

torch.manual_seed(0)

ATOL = 2e-4


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _convert(torch_model, jax_model, *example_args):
    variables = jax.jit(jax_model.init)(jax.random.PRNGKey(0), *example_args)
    return convert_state_dict(torch_model.state_dict(), variables)


def _apply(jax_model, variables, *args):
    return np.asarray(jax.jit(jax_model.apply)(variables, *args))


def _rand(rng, *shape):
    return rng.standard_normal(shape, dtype=np.float32)


# ---------------------------------------------------------------------------
# Block-level parity
# ---------------------------------------------------------------------------


def test_nafblock_parity(ref, rng):
    tm = ref["nafnet"].NAFBlock(16).eval()
    from midd_tpu.models.blocks import NAFBlock

    x = _rand(rng, 2, 16, 16, 16)
    jm = NAFBlock()
    variables = _convert(tm, jm, jnp.asarray(x))
    # beta/gamma are zero-init in torch; randomize so the residual scales matter
    with torch.no_grad():
        tm.beta.copy_(torch.randn_like(tm.beta) * 0.1)
        tm.gamma.copy_(torch.randn_like(tm.gamma) * 0.1)
    variables = convert_state_dict(tm.state_dict(), variables)

    ours = _apply(jm, variables, jnp.asarray(x))
    theirs = _to_nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_residual_block_parity(ref, rng):
    tm = ref["ddim"].ResidualBlock(16, 32, 64).eval()
    from midd_tpu.models.blocks import ResidualBlock

    x = _rand(rng, 2, 12, 12, 16)
    t_emb = _rand(rng, 2, 64)
    jm = ResidualBlock(32)
    variables = _convert(tm, jm, jnp.asarray(x), jnp.asarray(t_emb))
    ours = _apply(jm, variables, jnp.asarray(x), jnp.asarray(t_emb))
    theirs = _to_nhwc(tm(_nchw(x), torch.from_numpy(t_emb)))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


@pytest.mark.parametrize("variant", ["ddim", "hybrid"])
def test_attention_block_parity(ref, rng, variant):
    """The chunked (DDIM) and full (hybrid) torch attention variants are the
    same math; both must match the single midd_tpu implementation."""
    tm = ref[variant].AttentionBlock(32).eval()
    from midd_tpu.models.blocks import AttentionBlock

    x = _rand(rng, 1, 16, 16, 32)
    jm = AttentionBlock()
    variables = _convert(tm, jm, jnp.asarray(x))
    ours = _apply(jm, variables, jnp.asarray(x))
    theirs = _to_nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_conv_transpose_parity(rng):
    from midd_tpu.models.blocks import ConvTransposeTorch

    for (k, s, p) in [(4, 2, 1), (2, 2, 0)]:
        tm = torch.nn.ConvTranspose2d(8, 12, k, stride=s, padding=p)
        x = _rand(rng, 2, 9, 11, 8)
        jm = ConvTransposeTorch(12, k, s, p)
        variables = _convert(tm, jm, jnp.asarray(x))
        ours = _apply(jm, variables, jnp.asarray(x))
        theirs = _to_nhwc(tm(_nchw(x)))
        np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_groupnorm32_parity(rng):
    # Direct unit parity for GroupNorm32 (usually only covered through the
    # full-model golden tests): offset + scaled input stresses the
    # E[x^2]-mean^2 one-pass variance against torch's centered form.
    tm = torch.nn.GroupNorm(8, 48)
    with torch.no_grad():
        tm.weight.copy_(torch.randn_like(tm.weight))
        tm.bias.copy_(torch.randn_like(tm.bias))
    from midd_tpu.models.blocks import GroupNorm32

    x = _rand(rng, 2, 9, 11, 48) * 4 + 7
    jm = GroupNorm32()
    variables = _convert(tm, jm, jnp.asarray(x))
    ours = _apply(jm, variables, jnp.asarray(x))
    theirs = _to_nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_layernorm2d_parity(ref, rng):
    tm = ref["nafnet"].LayerNorm(24)
    with torch.no_grad():
        tm.weight.copy_(torch.randn_like(tm.weight))
        tm.bias.copy_(torch.randn_like(tm.bias))
    from midd_tpu.models.blocks import LayerNorm2d

    x = _rand(rng, 2, 8, 8, 24) * 3 + 1
    jm = LayerNorm2d()
    variables = _convert(tm, jm, jnp.asarray(x))
    ours = _apply(jm, variables, jnp.asarray(x))
    theirs = _to_nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


# ---------------------------------------------------------------------------
# ops parity
# ---------------------------------------------------------------------------


def test_resize_bilinear_matches_torch(rng):
    from midd_tpu.ops.image import resize_bilinear

    # (26, 34) exercises the exact-2x-up stencil path, (6, 8) the exact
    # 2x-down (mean-pool) path, the rest the general gather/matmul fallback
    x = _rand(rng, 2, 13, 17, 3)
    for size in [(26, 34), (7, 9), (13, 17), (52, 51), (6, 8)]:
        ours = np.asarray(resize_bilinear(jnp.asarray(x), size))
        theirs = _to_nhwc(
            torch.nn.functional.interpolate(
                _nchw(x), size=size, mode="bilinear", align_corners=False
            )
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)
    x2 = _rand(rng, 1, 12, 16, 2)
    ours = np.asarray(resize_bilinear(jnp.asarray(x2), (6, 8)))
    theirs = _to_nhwc(
        torch.nn.functional.interpolate(
            _nchw(x2), size=(6, 8), mode="bilinear", align_corners=False
        )
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_pixel_shuffle_matches_torch(rng):
    from midd_tpu.ops.image import pixel_shuffle

    x = _rand(rng, 2, 5, 7, 16)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    theirs = _to_nhwc(torch.nn.functional.pixel_shuffle(_nchw(x), 2))
    np.testing.assert_allclose(ours, theirs, atol=0)


# ---------------------------------------------------------------------------
# Full-model parity (converted random weights)
# ---------------------------------------------------------------------------


def test_nafnet_full_parity(ref, rng):
    tm = ref["nafnet"].EnhancedNAFNet().eval()
    x = np.clip(_rand(rng, 1, 64, 64, 1) * 0.2 + 0.5, 0, 1)
    jm = EnhancedNAFNet(config.SERVE_NAFNET)
    variables = _convert(tm, jm, jnp.asarray(x))
    ours = _apply(jm, variables, jnp.asarray(x))
    with torch.no_grad():
        theirs = _to_nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_nafnet_odd_size_parity(ref, rng):
    tm = ref["nafnet"].EnhancedNAFNet().eval()
    x = np.clip(_rand(rng, 1, 50, 35, 1) * 0.2 + 0.5, 0, 1)
    jm = EnhancedNAFNet(config.SERVE_NAFNET)
    variables = _convert(tm, jm, jnp.asarray(x))
    ours = _apply(jm, variables, jnp.asarray(x))
    with torch.no_grad():
        theirs = _to_nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_expert_full_parity(ref, rng):
    tm = ref["direct"].ExpertDenoiser(1, 64).eval()
    x = np.clip(_rand(rng, 1, 32, 32, 1) * 0.2 + 0.5, 0, 1)
    jm = ExpertDenoiser(config.SERVE_EXPERT)
    variables = _convert(tm, jm, jnp.asarray(x))
    ours = _apply(jm, variables, jnp.asarray(x))
    with torch.no_grad():
        theirs = _to_nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


@pytest.mark.parametrize("variant,cfg", [("ddim", config.SERVE_DIFFUSION), ("cddpm", config.CDDPM_UNET)])
def test_diffusion_unet_full_parity(ref, rng, variant, cfg):
    tm = ref[variant].UNetDiffusion().eval()
    x = _rand(rng, 1, 32, 32, 1) * 0.3
    cond = _rand(rng, 1, 32, 32, 1) * 0.3
    t = np.array([7], np.int64)
    jm = UNetDiffusion(cfg)
    variables = _convert(tm, jm, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t))
    ours = _apply(jm, variables, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t))
    with torch.no_grad():
        theirs = _to_nhwc(tm(_nchw(x), _nchw(cond), torch.from_numpy(t)))
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_router_full_parity(ref, rng):
    tm = ref["hybrid"].NoiseAnalyzer().eval()
    x = np.clip(_rand(rng, 1, 33, 47, 1) * 0.2 + 0.5, 0, 1)  # odd size -> resize paths
    jm = NoiseAnalyzer(config.RouterConfig())
    variables = _convert(tm, jm, jnp.asarray(x))
    ours = _apply(jm, variables, jnp.asarray(x))
    with torch.no_grad():
        theirs = _to_nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_fusion_full_parity(ref, rng):
    tm = ref["hybrid"].FusionModule().eval()
    a = np.clip(_rand(rng, 1, 24, 24, 1) * 0.2 + 0.5, 0, 1)
    b = np.clip(_rand(rng, 1, 24, 24, 1) * 0.2 + 0.5, 0, 1)
    m = np.clip(_rand(rng, 1, 24, 24, 1) * 0.2 + 0.5, 0, 1)
    jm = FusionModule(config.FusionConfig())
    variables = _convert(tm, jm, jnp.asarray(a), jnp.asarray(b), jnp.asarray(m))
    ours = _apply(jm, variables, jnp.asarray(a), jnp.asarray(b), jnp.asarray(m))
    with torch.no_grad():
        theirs = _to_nhwc(tm(_nchw(a), _nchw(b), _nchw(m)))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_tiny_unet_full_parity(ref, rng):
    tm = ref["tiny"].TinyUNet(in_ch=2, base_ch=32, time_dim=64).eval()
    lat = _rand(rng, 1, 32, 32, 1)
    cond = _rand(rng, 1, 32, 32, 1)
    t = np.array([123], np.int64)
    jm = TinyUNet(config.TINY_UNET)
    variables = _convert(tm, jm, jnp.asarray(lat), jnp.asarray(t), jnp.asarray(cond))
    ours = _apply(jm, variables, jnp.asarray(lat), jnp.asarray(t), jnp.asarray(cond))
    with torch.no_grad():
        theirs = _to_nhwc(tm(_nchw(lat), torch.from_numpy(t), _nchw(cond)))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_model2_nafnet_full_parity(ref, rng):
    tm = ref["model2"].EnhancedNAFNet().eval()
    x = np.clip(_rand(rng, 1, 32, 32, 1) * 0.2 + 0.5, 0, 1)
    jm = EnhancedNAFNet(config.MODEL2_NAFNET)
    variables = _convert(tm, jm, jnp.asarray(x))
    ours = _apply(jm, variables, jnp.asarray(x))
    with torch.no_grad():
        theirs = _to_nhwc(tm(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)
