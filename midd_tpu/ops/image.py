"""Image-space ops with torch-exact semantics, NHWC layout.

These back the model-internal resampling paths of the reference:
- ``F.interpolate(mode='bilinear', align_corners=False)`` shape-fixes
  (DDIM/DDIMModel.py:241-242, NafNet/NafnetModel.py:292-293,
  hybrid3diffusionspeed.py:519-531) — NOTE: in the diffusion UNet decoder this
  is on the hot path at *every* up-ResBlock because the skip stack makes the
  decoder ping-pong spatially (each popped skip dictates the resolution).
- ``nn.PixelShuffle(2)`` in the NAFNet upsamplers (NafNet/NafnetModel.py:264-267).
- ``F.pad`` pad-to-multiple (NafNet/NafnetModel.py:304-309).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange


def _up2_conv(x: jnp.ndarray) -> jnp.ndarray:
    """Exact half-pixel bilinear 2x upsample as a separable VPU stencil.

    At factor 2 the half-pixel kernel weights are constants: output ``2i``
    maps to ``0.25*in[i-1] + 0.75*in[i]`` and output ``2i+1`` to
    ``0.75*in[i] + 0.25*in[i+1]`` per axis (border taps clamp, matching
    torch, via the 1-pixel edge-replicated pad). The two phases are weighted
    shifted sums interleaved with a stack+reshape per axis — all VPU
    elementwise + sublane-dim regroups, channels-minor throughout.

    Measured on v5e (scan-20, bf16) against the alternatives at the decoder
    ping-pong shapes (512² b1 level-0 / 256² b8 / 96-ch):
    transposed-conv with identity channel mix 3.31/2.47/1.97 ms (the C×
    FLOP waste of the identity mixing bites at 512²), depthwise conv
    2.71/2.30/1.66, general gather resize 1.88/2.30/1.71, THIS FORM
    **1.37/1.62/1.40** — the round-3 "conv form beats elementwise" note
    was an artifact of an unfused earlier formulation; the phase-interleave
    stencil is the fastest everywhere and was re-adopted.
    """
    b, h, w, c = x.shape
    xp = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
    xp = jnp.concatenate([xp[:, :, :1], xp, xp[:, :, -1:]], axis=2)
    hi = jnp.asarray(0.75, x.dtype)
    lo = jnp.asarray(0.25, x.dtype)
    r_ev = lo * xp[:, :-2] + hi * xp[:, 1:-1]
    r_od = hi * xp[:, 1:-1] + lo * xp[:, 2:]
    rows = jnp.stack([r_ev, r_od], axis=2).reshape(b, 2 * h, w + 2, c)
    c_ev = lo * rows[:, :, :-2] + hi * rows[:, :, 1:-1]
    c_od = hi * rows[:, :, 1:-1] + lo * rows[:, :, 2:]
    return jnp.stack([c_ev, c_od], axis=3).reshape(b, 2 * h, 2 * w, c)


def _down2_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Exact half-pixel bilinear 2x downsample: the factor-2 kernel weights
    are 0.5/0.5 per axis, i.e. 2x2 mean pooling. Expressed as split-dims +
    mean (layout-free dim splits, small-axis reduce) rather than
    ``lax.reduce_window``: identical XLA lowering on TPU, and reduce_window
    with a generic computation has no reverse-mode autodiff (the hybrid
    trainer differentiates through the decoder's shape-fix resizes)."""
    b, h, w, c = x.shape
    s = x.reshape(b, h // 2, 2, w // 2, 2, c)
    quarter = jnp.asarray(0.25, x.dtype)
    return (s.sum(axis=(2, 4)) * quarter).astype(x.dtype)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """torch ``F.interpolate(x, size, mode='bilinear', align_corners=False)``
    for NHWC input. Half-pixel centers, no antialias (torch's default).

    The decoder ping-pong (see models/unet_diffusion.py) makes this a hot
    op: exact 2x up/down take fixed-kernel MXU/reduce-window paths (same
    math — see ``_up2_conv``/``_down2_pool``); everything else falls back to
    the general ``jax.image.resize`` gather/matmul path.
    """
    h, w = x.shape[1], x.shape[2]
    if (h, w) == tuple(size):
        return x
    b, _, _, c = x.shape
    if size[0] == 2 * h and size[1] == 2 * w:
        return _up2_conv(x)
    if 2 * size[0] == h and 2 * size[1] == w:
        return _down2_pool(x)
    return jax.image.resize(
        x, (b, size[0], size[1], c), method="linear", antialias=False
    ).astype(x.dtype)


def pixel_shuffle(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """torch ``nn.PixelShuffle``: out[b, c, h*r+i, w*r+j] = in[b, c*r^2 + i*r + j, h, w],
    expressed in NHWC with torch channel ordering preserved."""
    return rearrange(x, "b h w (c r1 r2) -> b (h r1) (w r2) c", r1=factor, r2=factor)


def pad_to_multiple(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Zero-pad H and W on the bottom/right to a multiple, like the reference's
    ``check_image_size`` (NafNet/NafnetModel.py:304-309)."""
    h, w = x.shape[1], x.shape[2]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``AdaptiveAvgPool2d(1)`` for NHWC: (B,H,W,C) -> (B,1,1,C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
