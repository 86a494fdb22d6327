"""PSNR / SSIM in JAX, numerically matching the skimage defaults.

The reference calls ``skimage.metrics.peak_signal_noise_ratio`` and
``structural_similarity`` with ``data_range=1.0`` in five copy-pasted
``compute_metrics`` helpers (DDIM/DDIMModel.py:291-300, NafNet:389-402,
DirectUNet:270-279, hybrid:448-467, newfastmodel:192-201). The hybrid copy adds
a NaN guard and a flat-image PSNR=40 fallback (hybrid3diffusionspeed.py:448-467).

This is the ONE canonical implementation, jittable and batched. SSIM follows
the skimage defaults exactly: 7x7 uniform window (scipy ``uniform_filter`` with
``mode='reflect'`` == ``jnp.pad(mode='symmetric')``), K1=0.01, K2=0.03,
unbiased covariance normalisation NP/(NP-1), and edge-cropped mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _to_bhw(x: jnp.ndarray) -> jnp.ndarray:
    """Accept (B,H,W), (B,H,W,1) or (H,W) and return (B,H,W)."""
    if x.ndim == 2:
        return x[None]
    if x.ndim == 4:
        if x.shape[-1] != 1:
            raise ValueError(f"expected single-channel images, got {x.shape}")
        return x[..., 0]
    if x.ndim == 3:
        return x
    raise ValueError(f"unsupported image rank: {x.shape}")


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Per-image PSNR over (B,H,W[,1]) arrays. Returns shape (B,)."""
    p, t = _to_bhw(pred), _to_bhw(target)
    err = jnp.mean(jnp.square(p - t), axis=(-2, -1))
    return 10.0 * jnp.log10((data_range * data_range) / err)


def _uniform_filter(img: jnp.ndarray, size: int = 7) -> jnp.ndarray:
    """scipy.ndimage.uniform_filter(img, size, mode='reflect') for a 2D image.

    scipy 'reflect' duplicates the edge sample == numpy/jnp pad 'symmetric'.
    Separable 1/size box filter.
    """
    pad = size // 2
    xp = jnp.pad(img, ((pad, pad), (pad, pad)), mode="symmetric")
    k = jnp.ones((size,), img.dtype) / size
    conv = lambda v: jnp.convolve(v, k, mode="valid", precision="highest")
    xp = jax.vmap(conv)(xp)
    xp = jax.vmap(conv, in_axes=1, out_axes=1)(xp)
    return xp


def _ssim_single(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float,
    win_size: int,
    k1: float,
    k2: float,
) -> jnp.ndarray:
    filt = lambda im: _uniform_filter(im, win_size)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)  # skimage use_sample_covariance=True

    ux = filt(pred)
    uy = filt(target)
    uxx = filt(pred * pred)
    uyy = filt(target * target)
    uxy = filt(pred * target)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    pad = (win_size - 1) // 2
    return jnp.mean(s[pad:-pad, pad:-pad])


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Per-image SSIM matching skimage defaults. Returns shape (B,)."""
    p, t = _to_bhw(pred), _to_bhw(target)
    return jax.vmap(lambda a, b: _ssim_single(a, b, data_range, win_size, k1, k2))(p, t)


def compute_metrics(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    flat_psnr_fallback: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-mean (PSNR, SSIM) with [0,1] clipping, mirroring the reference
    helpers. ``flat_psnr_fallback=True`` reproduces the hybrid copy's rule of
    reporting 40 dB when the target image is constant
    (hybrid3diffusionspeed.py:461-464)."""
    # Metrics are always fp32 regardless of the model's compute dtype: SSIM's
    # variance/covariance terms are numerically meaningless in bf16 (measured:
    # SSIM "1.41" on bf16 engine outputs before this cast).
    p = jnp.clip(_to_bhw(pred).astype(jnp.float32), 0.0, 1.0)
    t = jnp.clip(_to_bhw(target).astype(jnp.float32), 0.0, 1.0)
    psnr_vals = psnr(p, t)
    if flat_psnr_fallback:
        flat = (jnp.max(t, axis=(-2, -1)) - jnp.min(t, axis=(-2, -1))) == 0
        psnr_vals = jnp.where(flat, 40.0, psnr_vals)
    ssim_vals = ssim(p, t)
    return jnp.mean(psnr_vals), jnp.mean(ssim_vals)
