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


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """torch ``F.interpolate(x, size, mode='bilinear', align_corners=False)``
    for NHWC input. Half-pixel centers, no antialias (torch's default)."""
    if x.shape[1:3] == tuple(size):
        return x
    b, _, _, c = x.shape
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
