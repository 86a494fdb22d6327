"""Loss suites for every trainer family.

Reference losses, one canonical implementation each:
- NAFNet CombinedLoss = 1.0*MSE + 0.5*L1 + 0.3*Frequency + 0.2*Edge
  (NafNet/NafnetModel.py:349-386)
- FrequencyLoss: L1 of |rfft2| with ortho norm (NafNet:312-322)
- EdgeLoss: Sobel gradient-magnitude L1 (NafNet:325-346, eps 1e-6;
  the diffusion trainer's inline copy uses eps 1e-8, DDIM/DDIMModel.py:371)
- Hybrid PerceptualLoss = MSE + 0.5*L1 + 0.3*multi-scale-L1 over avg-pool
  scales (1,2,4) (hybrid3diffusionspeed.py:421-445)
- Expert HybridLoss = L1 + 0.3*perceptual + 0.4*(1-SSIM)
  (DirectUNet/DirectUNetModel.py:257-268). Two documented deviations, both
  flag-controlled:
  (a) the reference's SSIM term is computed in numpy on detached tensors and
      carries NO gradient (DirectUNet:17-23,266) — ``dead_grad_ssim=True``
      replicates that; the default uses the differentiable JAX SSIM;
  (b) the reference's perceptual term uses pretrained VGG19 features
      (DirectUNet:143-158) which require downloaded weights; this framework
      substitutes a fixed, seeded random-conv feature pyramid
      (``feature_loss``) — a standard "random VGG" perceptual proxy.
- TinyUNet CombinedLoss = 0.5*MSE + 0.3*L1 + 0.2*EdgeXY against the NOISE
  target (newfastmodel/modelfunctions.py:169-191)
- Diffusion trainer loss = MSE(eps) + 0.2*Edge(pred_x0, clean)
  (DDIM/DDIMModel.py:360-375)
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from midd_tpu.train.metrics import ssim as ssim_metric

SOBEL_X = jnp.asarray(
    [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], jnp.float32
)
SOBEL_Y = jnp.asarray(
    [[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]], jnp.float32
)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred - target))


def l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def _conv2d_single(x: jnp.ndarray, k2d: jnp.ndarray) -> jnp.ndarray:
    """3x3 zero-padded conv of a single-channel NHWC batch (torch F.conv2d
    padding=1 semantics)."""
    k = k2d[:, :, None, None]
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        k,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def sobel_magnitude(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    gx = _conv2d_single(x, SOBEL_X)
    gy = _conv2d_single(x, SOBEL_Y)
    return jnp.sqrt(gx * gx + gy * gy + eps)


def edge_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return l1(sobel_magnitude(pred, eps), sobel_magnitude(target, eps))


def edge_loss_xy(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """TinyUNet edge loss: per-direction L1 without the magnitude
    (newfastmodel/modelfunctions.py:176-181)."""
    return l1(_conv2d_single(pred, SOBEL_X), _conv2d_single(target, SOBEL_X)) + l1(
        _conv2d_single(pred, SOBEL_Y), _conv2d_single(target, SOBEL_Y)
    )


def frequency_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 of rfft2 amplitudes, norm='ortho' (NafNet:312-322). FFT over the
    spatial axes of NHWC input."""
    pf = jnp.fft.rfft2(pred.astype(jnp.float32), axes=(1, 2), norm="ortho")
    tf = jnp.fft.rfft2(target.astype(jnp.float32), axes=(1, 2), norm="ortho")
    return jnp.mean(jnp.abs(jnp.abs(pf) - jnp.abs(tf)))


def combined_loss_nafnet(
    pred: jnp.ndarray, target: jnp.ndarray
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    parts = {
        "mse": mse(pred, target),
        "l1": l1(pred, target),
        "freq": frequency_loss(pred, target),
        "edge": edge_loss(pred, target, eps=1e-6),
    }
    total = 1.0 * parts["mse"] + 0.5 * parts["l1"] + 0.3 * parts["freq"] + 0.2 * parts["edge"]
    return total, parts


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def perceptual_loss_hybrid(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Hybrid trainer loss (hybrid3diffusionspeed.py:421-445)."""
    loss_ms = 0.0
    for scale in (1, 2, 4):
        p = pred if scale == 1 else _avg_pool(pred, scale)
        t = target if scale == 1 else _avg_pool(target, scale)
        loss_ms = loss_ms + l1(p, t)
    loss_ms = loss_ms / 3.0
    return mse(pred, target) + 0.5 * l1(pred, target) + 0.3 * loss_ms


def ssim_loss(
    pred: jnp.ndarray, target: jnp.ndarray, dead_grad: bool = False
) -> jnp.ndarray:
    """1 - mean SSIM. ``dead_grad=True`` replicates the reference's
    no-gradient numpy SSIM term (DirectUNet:17-23,266)."""
    s = jnp.mean(ssim_metric(pred, target))
    loss = 1.0 - s
    return jax.lax.stop_gradient(loss) if dead_grad else loss


def _feature_params(seed: int = 1234, in_ch: int = 1, widths=(16, 32, 64)):
    """Fixed random conv stack standing in for VGG19 features[:16]
    (no pretrained weights available offline; documented deviation).
    Built with numpy so lazy creation is trace-safe (constants under jit)."""
    import numpy as _np

    rng = _np.random.default_rng(seed)
    params = []
    c = in_ch
    for w in widths:
        k = rng.standard_normal((3, 3, c, w)).astype(_np.float32) * (
            2.0 / (9 * c)
        ) ** 0.5
        # keep plain numpy: any jnp array materialised lazily inside a jit
        # trace would be a Tracer and leak out of the trace
        params.append(k)
        c = w
    return params


_FEATURE_PARAMS = _feature_params()


def feature_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Random-feature perceptual distance (VGG19 substitute for the Expert
    trainer, DirectUNet:143-158). Deterministic: seeded once at import."""

    def feats(x):
        h = x.astype(jnp.float32)
        for i, k in enumerate(_FEATURE_PARAMS):
            h = jax.lax.conv_general_dilated(
                h, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = jax.nn.relu(h)
            if i < len(_FEATURE_PARAMS) - 1:
                h = _avg_pool(h, 2)
        return h

    return l1(feats(pred), feats(target))


def hybrid_loss_expert(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    dead_grad_ssim: bool = False,
    perceptual_weight: float = 0.3,
) -> jnp.ndarray:
    """Expert trainer loss (DirectUNet:257-268): L1 + 0.3*perceptual +
    0.4*(1-SSIM). ``perceptual_weight=0`` drops the feature term entirely —
    the a/b arm of the random-feature-proxy validation (the VGG19 substitute
    is only kept if it measurably helps on the quality benchmark)."""
    out = l1(pred, target) + 0.4 * ssim_loss(pred, target, dead_grad=dead_grad_ssim)
    if perceptual_weight:
        out = out + perceptual_weight * feature_loss(pred, target)
    return out


def combined_loss_tiny(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """TinyUNet loss against the noise target (modelfunctions.py:184-191)."""
    return 0.5 * mse(pred, target) + 0.3 * l1(pred, target) + 0.2 * edge_loss_xy(pred, target)


def diffusion_loss(
    eps_pred: jnp.ndarray,
    eps_true: jnp.ndarray,
    x_t: jnp.ndarray,
    clean: jnp.ndarray,
    alpha_hat_t: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Diffusion trainer loss (DDIM/DDIMModel.py:356-375): eps is clamped to
    [-5,5], x0 reconstructed and clamped to [0,1], then
    MSE(eps) + 0.2 * Sobel-edge L1 on the reconstruction (eps 1e-8)."""
    eps_pred = jnp.clip(eps_pred, -5.0, 5.0)
    ah = alpha_hat_t[:, None, None, None]
    pred_clean = (x_t - jnp.sqrt(1.0 - ah) * eps_pred) / jnp.sqrt(ah)
    pred_clean = jnp.clip(pred_clean, 0.0, 1.0)
    parts = {
        "mse": mse(eps_pred, eps_true),
        "edge": edge_loss(pred_clean, clean, eps=1e-8),
    }
    return parts["mse"] + 0.2 * parts["edge"], parts
