"""TinyUNet — the 785K-param experimental fast conditional UNet.

Re-design of newfastmodel/modelfunctions.py:64-164: double-conv
(Conv+GN8+SiLU) blocks, AvgPool downs, bilinear ups, a single time-embedding
injection at the bottleneck, data domain [-1, 1].
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from midd_tpu.config import TinyUNetConfig
from midd_tpu.models.blocks import GroupNorm32, sinusoidal_embedding, tconv
from midd_tpu.ops.image import resize_bilinear


class ConvBlock(nn.Module):
    """(Conv3x3 + GN8 + SiLU) x2 (modelfunctions.py:64-77)."""

    out_c: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        x = tconv(self.out_c, 3, name="net_0", dtype=dt)(x)
        x = GroupNorm32(name="net_1")(x)
        x = nn.silu(x)
        x = tconv(self.out_c, 3, name="net_3", dtype=dt)(x)
        x = GroupNorm32(name="net_4")(x)
        return nn.silu(x)


class _Down(nn.Module):
    """AvgPool(2) then ConvBlock (modelfunctions.py:82-89)."""

    out_c: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return ConvBlock(self.out_c, name="conv", dtype=self.dtype)(x)


class _Up(nn.Module):
    """Bilinear x2 upsample, shape-fix, concat skip, ConvBlock
    (modelfunctions.py:94-106)."""

    out_c: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = resize_bilinear(x, skip.shape[1:3])
        x = jnp.concatenate([x, skip], axis=-1)
        return ConvBlock(self.out_c, name="conv", dtype=self.dtype)(x)


class TinyUNet(nn.Module):
    cfg: TinyUNetConfig = TinyUNetConfig()
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, latents: jnp.ndarray, timesteps: jnp.ndarray, cond_image: jnp.ndarray
    ) -> jnp.ndarray:
        cfg = self.cfg
        dt = self.dtype

        te = sinusoidal_embedding(timesteps, cfg.time_dim)
        if dt is not None:
            te = te.astype(dt)
            latents = latents.astype(dt)
            cond_image = cond_image.astype(dt)
        te = nn.Dense(cfg.time_dim, name="time_emb_0", dtype=dt)(te)
        te = nn.silu(te)
        te = nn.Dense(cfg.time_dim, name="time_emb_2", dtype=dt)(te)
        te = nn.Dense(cfg.base_ch * 4, name="time_proj", dtype=dt)(te)

        x = jnp.concatenate([latents, cond_image], axis=-1)
        x1 = ConvBlock(cfg.base_ch, name="inc", dtype=dt)(x)
        x2 = _Down(cfg.base_ch * 2, name="down1", dtype=dt)(x1)
        x3 = _Down(cfg.base_ch * 4, name="down2", dtype=dt)(x2)

        x3 = x3 + te[:, None, None, :].astype(x3.dtype)
        x_mid = ConvBlock(cfg.base_ch * 4, name="mid", dtype=dt)(x3)

        x = _Up(cfg.base_ch * 2, name="up2", dtype=dt)(x_mid, x2)
        x = _Up(cfg.base_ch, name="up1", dtype=dt)(x, x1)

        x = GroupNorm32(name="outc_0")(x)
        x = nn.silu(x)
        return tconv(1, 1, name="outc_2", dtype=dt)(x)
