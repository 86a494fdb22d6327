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

import jax

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
from midd_tpu.ops.unet_s2d import (
    DownS2dExit,
    GroupNorm32S2d,
    ResidualBlockS2d,
    TconvS2d,
    ds2,
    s2d,
    up2_s2d,
)


class FusedUpDown(nn.Module):
    """``down2 ∘ ConvTranspose(k4,s2,p1)`` collapsed into ONE 3x3 conv at the
    *input* resolution — the ddim decoder ping-pong quirk makes every
    upsampler's 2x output get immediately bilinear-halved back by the next
    up-ResBlock's skip shape-fix (DDIM/DDIMModel.py:227-246: each popped skip
    dictates the resolution, and after each ``up`` the next popped skip sits
    at the PRE-upsample resolution). The half-pixel 2x downsample is exactly
    2x2 mean pooling (ops/image.py::_down2_pool), and pooling a
    fractionally-strided conv is algebraically a stride-1 conv:

        per axis, pool tap m picks convT taps {2m+1, 2m+2} of the 4-tap
        kernel ->  w2[-1] = k[0]/2,  w2[0] = (k[1]+k[2])/2,  w2[1] = k[3]/2

    (k stored in conv form, i.e. already flipped — see ConvTransposeTorch),
    so w2 = 0.25 * (A k A^T) per (I,O) slice with A = [[1,0,0,0],
    [0,1,1,0],[0,0,0,1]]. Zero-padding composes exactly (the dilated conv's
    implicit zeros land on w2's out-of-range taps). Bias commutes with mean
    pooling. This removes the 4x-area intermediate entirely: at serving
    shapes the three fused upsamplers drop ~19% of the model's conv FLOPs
    with identical math (fp reassociation only; golden torch parity holds).

    Param tree is IDENTICAL to ``ConvTransposeTorch(features, 4, 2, 1)`` —
    checkpoints interchange, and the plain module remains the fallback
    whenever the next skip is NOT at the pre-upsample resolution. The guard
    is resolution-semantic (it checks the ACTUAL next popped skip), so the
    fusion also fires in cddpm mode wherever that mode's own ping-pong puts
    the next skip at the pre-upsample resolution — still exact
    (tests/test_unet_s2d.py::test_fused_updown_exact_in_cddpm_too)."""

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.param(
            "kernel_t",
            nn.initializers.lecun_normal(),
            (4, 4, in_ch, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = self.dtype or x.dtype
        a = jnp.asarray(
            [[1.0, 0, 0, 0], [0, 1.0, 1.0, 0], [0, 0, 0, 1.0]], k.dtype
        )
        w2 = 0.25 * jnp.einsum("ap,bq,pqio->abio", a, a, k)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            w2.astype(dtype),
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(dtype)


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
    # Collapse each decoder ConvTranspose whose output the ddim ping-pong
    # immediately bilinear-halves back into ONE conv at the input resolution
    # (see FusedUpDown — identical math, ~19% of model conv FLOPs removed).
    # Only fires when the next popped skip sits at the pre-upsample
    # resolution, so cddpm/mirrored topologies are untouched.
    fuse_updown: bool = True
    # Run the full-resolution region (in_conv, stage-0 ResBlocks/downsampler,
    # the final up-ResBlock and the output head) in a phase-major 2x2
    # space-to-depth layout (ops/unet_s2d.py — numerically equivalent, same
    # param tree; the s2d-conv probe measured the narrow-C 3x3s 1.09-1.12x
    # faster and stage-0 elementwise bytes halve). ddim mode only; the guard
    # falls back for odd sizes / cddpm / quant / dropout / stage-0 attention.
    # Measured with fuse_updown (unet_restructure_bench.json, v5e): together
    # 1.11x @256² b8, 1.10x @512² b2, 1.14x @512² b1 — both default ON.
    s2d_stage0: bool = True

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

        use_s2d = (
            self.s2d_stage0
            and cfg.skip_mode == "ddim"
            and not self.quant
            and cfg.dropout == 0.0
            and 0 not in cfg.attention_resolutions
            and len(cfg.channel_mult) > 1
            # the s2d conv win is a NARROW-channel effect: the probe
            # (s2d_conv_probe.json) measured 3x3s 1.09-1.12x faster at C=48
            # but 0.86x (slower) at C>=96, and the w96 rollout regressed
            # 27.1 -> 23.8 img/s before this gate (rollout_timing_refresh).
            and cfg.model_channels <= 64
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )

        x = jnp.concatenate([x, condition], axis=-1)
        if use_s2d:
            x = TconvS2d(cfg.model_channels, name="in_conv", dtype=dt)(s2d(x))
        else:
            x = tconv(cfg.model_channels, 3, name="in_conv", dtype=dt)(x)

        in_s2d = use_s2d
        skips = []
        sflags = []
        for j, (kind, arg) in enumerate(downs_spec):
            name = f"downs_{j}"
            if kind == "res":
                if in_s2d:
                    x = ResidualBlockS2d(arg, name=name, dtype=dt)(x, t_emb)
                else:
                    x = ResidualBlock(arg, cfg.dropout, name=name, dtype=dt, quant=self.quant)(
                        x, t_emb, deterministic
                    )
            elif kind == "attn":
                x = AttentionBlock(name=name, use_flash=self.use_flash, dtype=dt)(x)
            else:
                if in_s2d:
                    # the stride-2 downsampler consumes exactly one s2d cell
                    # per output pixel: exits the layout for free
                    x = DownS2dExit(arg, name=name, dtype=dt)(x)
                    in_s2d = False
                else:
                    x = tconv(arg, 3, stride=2, name=name, dtype=dt, quant=self.quant)(x)
            skips.append(x)
            sflags.append(in_s2d)
        if in_s2d:  # single-stage topologies never exit via a downsampler
            x = ds2(x)
            in_s2d = False

        x = ResidualBlock(x.shape[-1], cfg.dropout, name="mid_block1", dtype=dt, quant=self.quant)(
            x, t_emb, deterministic
        )
        x = AttentionBlock(name="mid_attn", use_flash=self.use_flash, dtype=dt)(x)
        x = ResidualBlock(x.shape[-1], cfg.dropout, name="mid_block2", dtype=dt, quant=self.quant)(
            x, t_emb, deterministic
        )

        x_s2d = False
        for j, (kind, arg) in enumerate(ups_spec):
            name = f"ups_{j}"
            if kind == "res":
                skip = skips.pop()
                skip_s2d = sflags.pop()
                if skip_s2d:
                    # re-enter s2d for the full-resolution up-ResBlocks
                    h2, w2 = skip.shape[1], skip.shape[2]
                    if x_s2d and x.shape[1:3] == (h2, w2):
                        xs = x
                    else:
                        xn = ds2(x) if x_s2d else x
                        if xn.shape[1:3] == (h2, w2):
                            xs = up2_s2d(xn)  # the ping-pong 2x shape-fix
                        elif xn.shape[1:3] == (2 * h2, 2 * w2):
                            xs = s2d(xn)
                        else:
                            xs = s2d(resize_bilinear(xn, (2 * h2, 2 * w2)))
                    segs = (xs.shape[-1] // 4, skip.shape[-1] // 4)
                    x = ResidualBlockS2d(arg, segments=segs, name=name, dtype=dt)(
                        jnp.concatenate([xs, skip], axis=-1), t_emb
                    )
                    x_s2d = True
                else:
                    if x_s2d:
                        x = ds2(x)
                        x_s2d = False
                    x = resize_bilinear(x, skip.shape[1:3])
                    x = jnp.concatenate([x, skip], axis=-1)
                    x = ResidualBlock(arg, cfg.dropout, name=name, dtype=dt, quant=self.quant)(
                        x, t_emb, deterministic
                    )
            elif kind == "attn":
                if x_s2d:
                    x = ds2(x)
                    x_s2d = False
                x = AttentionBlock(name=name, use_flash=self.use_flash, dtype=dt)(x)
            else:
                if x_s2d:
                    x = ds2(x)
                    x_s2d = False
                nat_hw = (
                    (2 * skips[-1].shape[1], 2 * skips[-1].shape[2])
                    if skips and sflags[-1]
                    else (skips[-1].shape[1], skips[-1].shape[2])
                    if skips
                    else None
                )
                if self.fuse_updown and nat_hw == x.shape[1:3]:
                    # ddim ping-pong: the next popped skip is at THIS
                    # resolution, so the 2x upsample would be immediately
                    # bilinear-halved back — collapse both into one conv.
                    x = FusedUpDown(arg, name=name, dtype=dt)(x)
                else:
                    x = ConvTransposeTorch(arg, 4, 2, 1, name=name, dtype=dt)(x)

        if x_s2d:
            x = GroupNorm32S2d(name="out_conv_0")(x)
            x = nn.silu(x)
            x = TconvS2d(cfg.in_channels, name="out_conv_2", dtype=dt)(x)
            return ds2(x)
        x = GroupNorm32(name="out_conv_0")(x)
        x = nn.silu(x)
        return tconv(cfg.in_channels, 3, name="out_conv_2", dtype=dt)(x)
