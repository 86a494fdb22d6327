"""Conditional epsilon-prediction diffusion UNet.

Re-design of the reference UNetDiffusion. Two structural variants share this
implementation, selected by ``cfg.skip_mode``:

- "ddim" (DDIM/DDIMModel.py:168-248, also the hybrid's copy
  hybrid3diffusionspeed.py:308-388): up-ResBlocks are constructed with
  in=ch+ch, attention follows EVERY up-ResBlock at attention resolutions, and
  the skip bookkeeping has a deliberate quirk replicated here exactly: the
  downs push 13 skips but the ups pop only 12 — the first (in_conv -> first
  ResBlock) skip is never consumed (DDIM/DDIMModel.py:227-246). Because each
  popped skip dictates the working resolution (bilinear shape-fix to the
  skip's H,W), the decoder ping-pongs spatially; ``resize_bilinear`` is on the
  hot path of every up-ResBlock.

- "cddpm" (cddpm/cddpmModels.py:176-261): the constructor tracks
  ``down_channels`` so each up-ResBlock consumes the true skip width, and
  attention is inserted only after the first ResBlock per resolution.

Forward: t -> sinusoidal(model_channels) -> Dense -> SiLU -> Dense;
x = in_conv(cat([x, condition])); downs (skips pushed after EVERY module,
including attention and downsample outputs); mid Res+Attn+Res; ups; out:
GN8 -> SiLU -> 3x3 conv -> epsilon.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from midd_tpu.config import DiffusionUNetConfig
from midd_tpu.models.blocks import (
    AttentionBlock,
    ConvTransposeTorch,
    GroupNorm32,
    ResidualBlock,
    sinusoidal_embedding,
    tconv,
)
from midd_tpu.ops.image import resize_bilinear


def _build_specs(cfg: DiffusionUNetConfig) -> Tuple[List, List, int]:
    """Replicate the reference constructor loops to get the static module
    sequences (kind, out_ch) for downs and ups, and the mid channel count."""
    downs: List[Tuple[str, int]] = []
    down_channels: List[int] = []  # cddpm bookkeeping (cddpmModels.py:190-207)
    ch = cfg.model_channels
    n_res = len(cfg.channel_mult)

    for i in range(n_res):
        out_ch = cfg.model_channels * cfg.channel_mult[i]
        for _ in range(cfg.num_res_blocks):
            downs.append(("res", out_ch))
            ch = out_ch
            down_channels.append(ch)
            if i in cfg.attention_resolutions:
                downs.append(("attn", ch))
                down_channels.append(ch)
        if i != n_res - 1:
            downs.append(("down", ch))
            down_channels.append(ch)

    mid_ch = ch

    ups: List[Tuple[str, int]] = []
    for i in reversed(range(n_res)):
        out_ch = cfg.model_channels * cfg.channel_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            if cfg.skip_mode == "cddpm":
                down_channels.pop()
            ups.append(("res", out_ch))
            ch = out_ch
            if i in cfg.attention_resolutions and (
                cfg.skip_mode == "ddim" or j == 0
            ):
                ups.append(("attn", ch))
        if i != 0:
            ups.append(("up", ch))
    return downs, ups, mid_ch


class UNetDiffusion(nn.Module):
    cfg: DiffusionUNetConfig = DiffusionUNetConfig()
    use_flash: bool = False
    dtype: Optional[Any] = None
    # opt-in int8 convs (ops/qconv.py): quantizes the ResBlocks and
    # stride-2 downsamplers — first conv, attention projections, upsamplers
    # and the final eps projection stay full precision (quality practice).
    # Param tree is IDENTICAL, so any checkpoint loads. Values: False,
    # True/"dynamic" (per-call scales), "calibrate"/"static" (calibrated
    # scales — the fast path). Quality-gated, see PARITY.md /
    # EngineConfig.quantize_int8.
    quant: Any = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        condition: jnp.ndarray,
        t: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dt = self.dtype
        downs_spec, ups_spec, _ = _build_specs(cfg)

        t_emb = sinusoidal_embedding(t, cfg.model_channels)
        if dt is not None:
            t_emb = t_emb.astype(dt)
            x = x.astype(dt)
            condition = condition.astype(dt)
        t_emb = nn.Dense(cfg.time_emb_dim, name="time_mlp_1", dtype=dt)(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(cfg.time_emb_dim, name="time_mlp_3", dtype=dt)(t_emb)

        x = jnp.concatenate([x, condition], axis=-1)
        x = tconv(cfg.model_channels, 3, name="in_conv", dtype=dt)(x)

        skips = []
        for j, (kind, arg) in enumerate(downs_spec):
            name = f"downs_{j}"
            if kind == "res":
                x = ResidualBlock(arg, cfg.dropout, name=name, dtype=dt, quant=self.quant)(
                    x, t_emb, deterministic
                )
            elif kind == "attn":
                x = AttentionBlock(name=name, use_flash=self.use_flash, dtype=dt)(x)
            else:
                x = tconv(arg, 3, stride=2, name=name, dtype=dt, quant=self.quant)(x)
            skips.append(x)

        x = ResidualBlock(x.shape[-1], cfg.dropout, name="mid_block1", dtype=dt, quant=self.quant)(
            x, t_emb, deterministic
        )
        x = AttentionBlock(name="mid_attn", use_flash=self.use_flash, dtype=dt)(x)
        x = ResidualBlock(x.shape[-1], cfg.dropout, name="mid_block2", dtype=dt, quant=self.quant)(
            x, t_emb, deterministic
        )

        for j, (kind, arg) in enumerate(ups_spec):
            name = f"ups_{j}"
            if kind == "res":
                skip = skips.pop()
                x = resize_bilinear(x, skip.shape[1:3])
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResidualBlock(arg, cfg.dropout, name=name, dtype=dt, quant=self.quant)(
                    x, t_emb, deterministic
                )
            elif kind == "attn":
                x = AttentionBlock(name=name, use_flash=self.use_flash, dtype=dt)(x)
            else:
                x = ConvTransposeTorch(arg, 4, 2, 1, name=name, dtype=dt)(x)

        x = GroupNorm32(name="out_conv_0")(x)
        x = nn.silu(x)
        return tconv(cfg.in_channels, 3, name="out_conv_2", dtype=dt)(x)
