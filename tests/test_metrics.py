"""PSNR/SSIM parity vs skimage — the correctness oracle for all quality numbers."""

import numpy as np
import pytest
from tests.skimage_oracle import peak_signal_noise_ratio, structural_similarity

import jax.numpy as jnp

from midd_tpu.train import metrics


def _pairs(rng, n=3, h=65, w=64):
    clean = rng.random((n, h, w), dtype=np.float64).astype(np.float32)
    noisy = np.clip(clean + rng.normal(0, 0.1, clean.shape).astype(np.float32), 0, 1)
    return clean, noisy


def test_psnr_matches_skimage(rng):
    clean, noisy = _pairs(rng)
    ours = np.asarray(metrics.psnr(jnp.asarray(noisy), jnp.asarray(clean)))
    for i in range(clean.shape[0]):
        ref = peak_signal_noise_ratio(clean[i], noisy[i], data_range=1.0)
        assert ours[i] == pytest.approx(ref, abs=1e-3)


def test_ssim_matches_skimage(rng):
    clean, noisy = _pairs(rng)
    ours = np.asarray(metrics.ssim(jnp.asarray(noisy), jnp.asarray(clean)))
    for i in range(clean.shape[0]):
        ref = structural_similarity(clean[i], noisy[i], data_range=1.0)
        assert ours[i] == pytest.approx(ref, abs=2e-4)


def test_compute_metrics_batch_mean(rng):
    clean, noisy = _pairs(rng, n=4)
    p, s = metrics.compute_metrics(jnp.asarray(noisy)[..., None], jnp.asarray(clean)[..., None])
    ref_p = np.mean(
        [peak_signal_noise_ratio(clean[i], noisy[i], data_range=1.0) for i in range(4)]
    )
    ref_s = np.mean(
        [structural_similarity(clean[i], noisy[i], data_range=1.0) for i in range(4)]
    )
    assert float(p) == pytest.approx(ref_p, abs=1e-3)
    assert float(s) == pytest.approx(ref_s, abs=2e-4)


def test_flat_image_fallback():
    flat = jnp.zeros((1, 32, 32))
    pred = jnp.full((1, 32, 32), 0.5)
    p, _ = metrics.compute_metrics(pred, flat, flat_psnr_fallback=True)
    assert float(p) == pytest.approx(40.0)


def test_identical_images_ssim_one(rng):
    clean, _ = _pairs(rng, n=1)
    s = metrics.ssim(jnp.asarray(clean), jnp.asarray(clean))
    assert float(s[0]) == pytest.approx(1.0, abs=1e-6)


def test_compute_metrics_bf16_inputs_match_fp32():
    """bf16 engine outputs must not corrupt the metrics: compute_metrics
    casts to fp32 internally (SSIM's covariance terms are meaningless in
    bf16 — observed SSIM > 1 before the cast)."""
    import jax.numpy as jnp

    from midd_tpu.train.metrics import compute_metrics

    rng = np.random.default_rng(0)
    clean = rng.random((2, 32, 32), dtype=np.float32)
    pred = np.clip(clean + rng.normal(0, 0.05, clean.shape).astype(np.float32), 0, 1)
    p32, s32 = compute_metrics(jnp.asarray(pred), jnp.asarray(clean))
    pbf, sbf = compute_metrics(
        jnp.asarray(pred).astype(jnp.bfloat16), jnp.asarray(clean).astype(jnp.bfloat16)
    )
    assert float(sbf) <= 1.0
    # bf16 quantization of the INPUTS shifts values slightly; the metric
    # computation itself must be fp32-stable
    np.testing.assert_allclose(float(pbf), float(p32), atol=0.5)
    np.testing.assert_allclose(float(sbf), float(s32), atol=0.02)
