"""Equivalence tests for the two round-4 UNet restructurings:

- FusedUpDown: the ddim decoder ping-pong's ``down2 ∘ ConvTranspose``
  collapsed to one conv (models/unet_diffusion.py::FusedUpDown).
- The stage-0 space-to-depth layout (ops/unet_s2d.py).

Both are numerically equivalent (fp reassociation only) with IDENTICAL param
trees, so checkpoints interchange — asserted here at op, block, and
full-model level against the plain layout (which itself holds golden parity
vs the live torch reference, tests/test_parity_torch.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midd_tpu import config
from midd_tpu.models.blocks import ConvTransposeTorch, GroupNorm32, ResidualBlock, tconv
from midd_tpu.models.unet_diffusion import FusedUpDown, UNetDiffusion
from midd_tpu.ops.image import resize_bilinear
from midd_tpu.ops.naf_s2d import ds2, s2d
from midd_tpu.ops.unet_s2d import (
    DownS2dExit,
    GroupNorm32S2d,
    ResidualBlockS2d,
    TconvS2d,
    up2_s2d,
)

RNG = np.random.default_rng(7)


def _rand(*shape):
    return jnp.asarray(RNG.standard_normal(shape), jnp.float32)


def _tree_shapes_equal(a, b):
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for (ka, la), (_, lb) in zip(
        jax.tree_util.tree_leaves_with_path(a), jax.tree_util.tree_leaves_with_path(b)
    ):
        assert la.shape == lb.shape, (ka, la.shape, lb.shape)


# ---------------------------------------------------------------- FusedUpDown


def test_fused_updown_matches_convtranspose_then_down2():
    x = _rand(2, 9, 13, 24)
    plain = ConvTransposeTorch(16, 4, 2, 1)
    fused = FusedUpDown(16)
    v = plain.init(jax.random.PRNGKey(0), x)
    vf = fused.init(jax.random.PRNGKey(0), x)
    _tree_shapes_equal(v, vf)
    ref = resize_bilinear(plain.apply(v, x), (x.shape[1], x.shape[2]))
    got = fused.apply(v, x)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fused_updown_in_model_matches_plain():
    x, cond = _rand(1, 32, 32, 1) * 0.3, _rand(1, 32, 32, 1) * 0.3
    t = jnp.asarray([7])
    m_p = UNetDiffusion(config.SERVE_DIFFUSION, fuse_updown=False)
    m_f = UNetDiffusion(config.SERVE_DIFFUSION, fuse_updown=True)
    v = m_p.init(jax.random.PRNGKey(1), x, cond, t)
    _tree_shapes_equal(v, m_f.init(jax.random.PRNGKey(1), x, cond, t))
    np.testing.assert_allclose(
        m_f.apply(v, x, cond, t), m_p.apply(v, x, cond, t), atol=2e-5
    )


def test_fused_updown_exact_in_cddpm_too():
    # cddpm shares the 13-push/12-pop ping-pong, so its upsampler outputs are
    # also immediately bilinear-halved when the next popped skip sits at the
    # pre-upsample resolution — the guard is resolution-semantic (checks the
    # actual next skip), so the fusion fires in cddpm mode as well and must
    # stay exact (fp reassociation only; measured max |Δ| ≈ 8e-7).
    x, cond = _rand(1, 32, 32, 1) * 0.3, _rand(1, 32, 32, 1) * 0.3
    t = jnp.asarray([3])
    m_p = UNetDiffusion(config.CDDPM_UNET, fuse_updown=False)
    m_f = UNetDiffusion(config.CDDPM_UNET, fuse_updown=True)
    v = m_p.init(jax.random.PRNGKey(2), x, cond, t)
    np.testing.assert_allclose(
        m_f.apply(v, x, cond, t), m_p.apply(v, x, cond, t), atol=2e-5
    )


# ----------------------------------------------------------------- s2d pieces


def test_tconv_s2d_matches_plain_conv():
    x = _rand(2, 16, 12, 24)
    plain = tconv(20, 3)
    s2dm = TconvS2d(20)
    v = plain.init(jax.random.PRNGKey(0), x)
    _tree_shapes_equal(v, s2dm.init(jax.random.PRNGKey(0), s2d(x)))
    np.testing.assert_allclose(
        ds2(s2dm.apply(v, s2d(x))), plain.apply(v, x), atol=2e-5
    )


def test_tconv_s2d_segmented_matches_concat():
    a, b = _rand(1, 8, 10, 6), _rand(1, 8, 10, 10)
    plain = tconv(12, 3)
    s2dm = TconvS2d(12, segments=(6, 10))
    xcat = jnp.concatenate([a, b], axis=-1)
    v = plain.init(jax.random.PRNGKey(0), xcat)
    xs = jnp.concatenate([s2d(a), s2d(b)], axis=-1)
    np.testing.assert_allclose(
        ds2(s2dm.apply(v, xs)), plain.apply(v, xcat), atol=2e-5
    )


def test_down_s2d_exit_matches_stride2_conv():
    x = _rand(2, 16, 12, 8)
    plain = tconv(24, 3, stride=2)
    s2dm = DownS2dExit(24)
    v = plain.init(jax.random.PRNGKey(0), x)
    _tree_shapes_equal(v, s2dm.init(jax.random.PRNGKey(0), s2d(x)))
    np.testing.assert_allclose(s2dm.apply(v, s2d(x)), plain.apply(v, x), atol=2e-5)


def test_up2_s2d_matches_resize():
    x = _rand(2, 7, 9, 12)
    ref = s2d(resize_bilinear(x, (14, 18)))
    np.testing.assert_array_equal(up2_s2d(x), ref)


def test_groupnorm_s2d_matches_plain():
    x = _rand(2, 8, 8, 48)
    plain = GroupNorm32()
    s2dm = GroupNorm32S2d()
    v = plain.init(jax.random.PRNGKey(0), x)
    v = jax.tree_util.tree_map(lambda a: a + _rand(*a.shape) * 0.1, v)
    np.testing.assert_allclose(
        ds2(s2dm.apply(v, s2d(x))), plain.apply(v, x), atol=2e-5
    )


def test_groupnorm_s2d_segmented_matches_concat():
    a, b = _rand(1, 8, 8, 48), _rand(1, 8, 8, 48)
    plain = GroupNorm32()
    s2dm = GroupNorm32S2d(segments=(48, 48))
    xcat = jnp.concatenate([a, b], axis=-1)
    v = plain.init(jax.random.PRNGKey(0), xcat)
    xs = jnp.concatenate([s2d(a), s2d(b)], axis=-1)
    got = s2dm.apply(v, xs)
    # re-interleave the segmented phase-major output back to natural order
    g1, g2 = got[..., : 4 * 48], got[..., 4 * 48 :]
    nat = jnp.concatenate([ds2(g1), ds2(g2)], axis=-1)
    np.testing.assert_allclose(nat, plain.apply(v, xcat), atol=2e-5)


def test_residual_block_s2d_matches_plain():
    x, te = _rand(2, 8, 8, 24), _rand(2, 192)
    plain = ResidualBlock(24)
    s2dm = ResidualBlockS2d(24)
    v = plain.init(jax.random.PRNGKey(0), x, te)
    _tree_shapes_equal(v, s2dm.init(jax.random.PRNGKey(0), s2d(x), te))
    np.testing.assert_allclose(
        ds2(s2dm.apply(v, s2d(x), te)), plain.apply(v, x, te), atol=2e-5
    )


def test_residual_block_s2d_segmented_with_res_conv():
    a, b, te = _rand(1, 8, 8, 24), _rand(1, 8, 8, 24), _rand(1, 192)
    plain = ResidualBlock(24)  # in 48 != out 24 -> res_conv
    s2dm = ResidualBlockS2d(24, segments=(24, 24))
    xcat = jnp.concatenate([a, b], axis=-1)
    v = plain.init(jax.random.PRNGKey(0), xcat, te)
    xs = jnp.concatenate([s2d(a), s2d(b)], axis=-1)
    _tree_shapes_equal(v, s2dm.init(jax.random.PRNGKey(0), xs, te))
    np.testing.assert_allclose(
        ds2(s2dm.apply(v, xs, te)), plain.apply(v, xcat, te), atol=2e-5
    )


def test_residual_block_s2d_segmented_identity_skip():
    # segments sum == out_c: the plain block has NO res_conv; the s2d block
    # must merge the segmented lanes param-free
    a, b, te = _rand(1, 8, 8, 12), _rand(1, 8, 8, 12), _rand(1, 192)
    plain = ResidualBlock(24)
    s2dm = ResidualBlockS2d(24, segments=(12, 12))
    xcat = jnp.concatenate([a, b], axis=-1)
    v = plain.init(jax.random.PRNGKey(0), xcat, te)
    xs = jnp.concatenate([s2d(a), s2d(b)], axis=-1)
    _tree_shapes_equal(v, s2dm.init(jax.random.PRNGKey(0), xs, te))
    np.testing.assert_allclose(
        ds2(s2dm.apply(v, xs, te)), plain.apply(v, xcat, te), atol=2e-5
    )


# ------------------------------------------------------------------ full model


@pytest.mark.parametrize("shape", [(1, 32, 32, 1), (2, 64, 48, 1)])
def test_unet_s2d_matches_plain(shape):
    x, cond = _rand(*shape) * 0.3, _rand(*shape) * 0.3
    t = jnp.asarray([7] * shape[0])
    m_p = UNetDiffusion(config.SERVE_DIFFUSION, s2d_stage0=False)
    m_s = UNetDiffusion(config.SERVE_DIFFUSION, s2d_stage0=True)
    v = m_p.init(jax.random.PRNGKey(3), x, cond, t)
    _tree_shapes_equal(v, m_s.init(jax.random.PRNGKey(3), x, cond, t))
    np.testing.assert_allclose(
        m_s.apply(v, x, cond, t), m_p.apply(v, x, cond, t), atol=5e-5
    )


def test_unet_s2d_odd_size_falls_back():
    x, cond = _rand(1, 33, 31, 1) * 0.3, _rand(1, 33, 31, 1) * 0.3
    t = jnp.asarray([7])
    m_p = UNetDiffusion(config.SERVE_DIFFUSION, s2d_stage0=False)
    m_s = UNetDiffusion(config.SERVE_DIFFUSION, s2d_stage0=True)
    v = m_p.init(jax.random.PRNGKey(3), x, cond, t)
    np.testing.assert_array_equal(
        m_s.apply(v, x, cond, t), m_p.apply(v, x, cond, t)
    )


def test_unet_layout_gradients_match_plain(rng):
    """The diffusion trainer runs the restructured UNet (s2d stage-0 +
    FusedUpDown are model defaults): its GRADIENTS must match the plain
    layout on the same params (identical tree), or training would silently
    optimise a different function than the checkpoints' semantics."""
    import jax
    import jax.numpy as jnp

    from midd_tpu import config
    from midd_tpu.models.unet_diffusion import UNetDiffusion

    cfg = config.DiffusionUNetConfig(
        model_channels=8, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(1,), time_emb_dim=16,
    )
    plain = UNetDiffusion(cfg, s2d_stage0=False, fuse_updown=False)
    fast = UNetDiffusion(cfg, s2d_stage0=True, fuse_updown=True)
    x = jnp.asarray(rng.random((2, 16, 16, 1), dtype=np.float32))
    c = jnp.asarray(rng.random((2, 16, 16, 1), dtype=np.float32))
    t = jnp.asarray([3, 7])
    params = jax.jit(plain.init)(jax.random.PRNGKey(0), x, c, t)

    def loss(model):
        def fn(v):
            eps = model.apply(v, x, c, t)
            return jnp.mean((eps - c) ** 2)
        return fn

    l0, g0 = jax.value_and_grad(loss(plain))(params)
    l1, g1 = jax.value_and_grad(loss(fast))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g0)[0],
        jax.tree_util.tree_flatten_with_path(g1)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}",
        )
