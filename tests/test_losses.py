"""Loss parity vs the reference torch loss modules, and gradient-behaviour
checks for the documented deviations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from tests.torch_ref import load_reference

from midd_tpu.train import losses


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _pair(rng, b=2, h=16, w=16):
    clean = rng.random((b, h, w, 1), dtype=np.float32)
    pred = np.clip(clean + rng.normal(0, 0.05, clean.shape).astype(np.float32), 0, 1)
    return pred, clean


def _t(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def test_frequency_loss_parity(ref, rng):
    pred, clean = _pair(rng)
    ours = float(losses.frequency_loss(jnp.asarray(pred), jnp.asarray(clean)))
    theirs = float(ref["nafnet"].FrequencyLoss()(_t(pred), _t(clean)))
    assert ours == pytest.approx(theirs, abs=1e-6)


def test_edge_loss_parity(ref, rng):
    pred, clean = _pair(rng)
    ours = float(losses.edge_loss(jnp.asarray(pred), jnp.asarray(clean), eps=1e-6))
    theirs = float(ref["nafnet"].EdgeLoss()(_t(pred), _t(clean)))
    assert ours == pytest.approx(theirs, abs=1e-6)


def test_combined_nafnet_loss_parity(ref, rng):
    pred, clean = _pair(rng)
    total, parts = losses.combined_loss_nafnet(jnp.asarray(pred), jnp.asarray(clean))
    t_total, t_parts = ref["nafnet"].CombinedLoss()(_t(pred), _t(clean))
    assert float(total) == pytest.approx(float(t_total), abs=1e-6)
    for k in ("mse", "l1", "freq", "edge"):
        assert float(parts[k]) == pytest.approx(t_parts[k], abs=1e-6)


def test_perceptual_hybrid_loss_parity(ref, rng):
    pred, clean = _pair(rng)
    ours = float(losses.perceptual_loss_hybrid(jnp.asarray(pred), jnp.asarray(clean)))
    theirs = float(ref["hybrid"].PerceptualLoss()(_t(pred), _t(clean)))
    assert ours == pytest.approx(theirs, abs=1e-6)


def test_tiny_combined_loss_parity(ref, rng):
    pred, clean = _pair(rng)
    ours = float(losses.combined_loss_tiny(jnp.asarray(pred), jnp.asarray(clean)))
    theirs = float(ref["tiny"].CombinedLoss()(_t(pred), _t(clean)))
    assert ours == pytest.approx(theirs, abs=1e-6)


def test_ssim_loss_gradient_behaviour(rng):
    """Default SSIM loss carries gradient; dead_grad replicates the
    reference's no-gradient term (DirectUNet:17-23,266)."""
    pred, clean = _pair(rng, b=1)
    g_live = jax.grad(lambda p: losses.ssim_loss(p, jnp.asarray(clean)))(
        jnp.asarray(pred)
    )
    g_dead = jax.grad(
        lambda p: losses.ssim_loss(p, jnp.asarray(clean), dead_grad=True)
    )(jnp.asarray(pred))
    assert float(jnp.abs(g_live).max()) > 0
    assert float(jnp.abs(g_dead).max()) == 0


def test_diffusion_loss_parity_with_reference_formula(rng):
    """Reproduce the reference's inline loss computation
    (DDIM/DDIMModel.py:356-375) in torch and compare."""
    b = 2
    eps_pred = rng.standard_normal((b, 16, 16, 1), dtype=np.float32) * 2
    eps_true = rng.standard_normal((b, 16, 16, 1), dtype=np.float32)
    x_t = rng.random((b, 16, 16, 1), dtype=np.float32)
    clean = rng.random((b, 16, 16, 1), dtype=np.float32)
    ah = np.asarray([0.9, 0.5], np.float32)

    ours, _ = losses.diffusion_loss(
        jnp.asarray(eps_pred),
        jnp.asarray(eps_true),
        jnp.asarray(x_t),
        jnp.asarray(clean),
        jnp.asarray(ah),
    )

    import torch.nn.functional as F

    tp = torch.clamp(_t(eps_pred), -5, 5)
    tah = torch.from_numpy(ah)[:, None, None, None]
    pred_clean = (_t(x_t) - torch.sqrt(1 - tah) * tp) / torch.sqrt(tah)
    pred_clean = torch.clamp(pred_clean, 0, 1)
    mse = F.mse_loss(tp, _t(eps_true))
    sx = torch.tensor([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=torch.float32).view(1, 1, 3, 3)
    sy = torch.tensor([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=torch.float32).view(1, 1, 3, 3)
    pe = torch.sqrt(
        F.conv2d(pred_clean, sx, padding=1) ** 2
        + F.conv2d(pred_clean, sy, padding=1) ** 2
        + 1e-8
    )
    te = torch.sqrt(
        F.conv2d(_t(clean), sx, padding=1) ** 2
        + F.conv2d(_t(clean), sy, padding=1) ** 2
        + 1e-8
    )
    theirs = mse + 0.2 * F.l1_loss(pe, te)
    assert float(ours) == pytest.approx(float(theirs), abs=1e-5)


def test_feature_loss_deterministic_and_discriminative(rng):
    pred, clean = _pair(rng)
    a = float(losses.feature_loss(jnp.asarray(pred), jnp.asarray(clean)))
    b = float(losses.feature_loss(jnp.asarray(pred), jnp.asarray(clean)))
    assert a == b  # seeded, deterministic
    zero = float(losses.feature_loss(jnp.asarray(clean), jnp.asarray(clean)))
    assert zero == pytest.approx(0.0, abs=1e-7)
    assert a > zero
