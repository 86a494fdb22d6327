"""Kernel-fused functional NAFNet forward.

``nafnet_apply_fused(params, cfg, x)`` computes exactly what
``EnhancedNAFNet.apply`` computes (equivalence-tested, bit-identical on TPU),
but executes each NAFBlock's FFN half through the fused Pallas kernel
(midd_tpu.ops.naf_ffn) instead of five separate XLA ops. It reads the
standard flax param tree directly, so any checkpoint that works with the
module works here.

MEASURED (TPU v5e-lite, bf16, batch 8): the fusion is neutral — 1.00x at
512², 0.94x at 256² with the channel threshold (without it, the 128-lane
padding makes the C=32 stages 2x slower). XLA's own elementwise-into-conv
fusion already covers these shapes well, confirming SURVEY §7's "measure
first" warning; the path is kept as correct, tested infrastructure for
wider-channel configs, and the flash-attention kernel (1.30x on the diffusion
UNet forward) remains the adopted Pallas win.

The first (spatial) half of the block keeps XLA's conv implementations —
the 3x3 depthwise conv and the SCA global pool don't tile into the row
kernel; XLA is already strong there.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from midd_tpu.config import NAFNetConfig
from midd_tpu.ops.image import pad_to_multiple, pixel_shuffle, resize_bilinear
from midd_tpu.ops.naf_ffn import naf_ffn_fused


def _conv(p: Dict, x: jnp.ndarray, stride: int = 1, pad: Optional[int] = None, groups: int = 1) -> jnp.ndarray:
    k = p["kernel"]
    kh = k.shape[0]
    pd = kh // 2 if pad is None else pad
    y = jax.lax.conv_general_dilated(
        x,
        k.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pd, pd), (pd, pd)),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _layernorm2d(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    u = xf.mean(-1, keepdims=True)
    s = jnp.mean(jnp.square(xf - u), axis=-1, keepdims=True)
    out = (xf - u) / jnp.sqrt(s + 1e-6) * p["scale"] + p["bias"]
    return out.astype(x.dtype)


# Below this channel count the kernel's 128-lane padding wastes more than the
# fusion saves (TPU measurement: C=32 stages at 512² run 2x slower fused, the
# C>=128 stages run ~1.1-1.3x faster); keep XLA for the narrow stages.
MIN_FUSED_CHANNELS = 128


def _nafblock(p: Dict, inp: jnp.ndarray) -> jnp.ndarray:
    c = inp.shape[-1]
    dw = p["conv2"]["kernel"].shape[-1]

    x = _layernorm2d(p["norm1"], inp)
    x = _conv(p["conv1"], x)
    x = _conv(p["conv2"], x, groups=dw)
    x1, x2 = jnp.split(x, 2, axis=-1)
    x = x1 * x2
    sca = jnp.mean(x, axis=(1, 2), keepdims=True)
    sca = _conv(p["sca_1"], sca)
    x = x * sca
    x = _conv(p["conv3"], x)
    y = inp + x * p["beta"].astype(x.dtype)

    if c < MIN_FUSED_CHANNELS:
        x = _layernorm2d(p["norm2"], y)
        x = _conv(p["conv4"], x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = _conv(p["conv5"], x1 * x2)
        return y + x * p["gamma"].astype(x.dtype)

    # fused FFN half (Pallas)
    return naf_ffn_fused(
        y,
        p["norm2"]["scale"],
        p["norm2"]["bias"],
        p["conv4"]["kernel"].reshape(c, -1),
        p["conv4"]["bias"],
        p["conv5"]["kernel"].reshape(-1, c),
        p["conv5"]["bias"],
        p["gamma"].reshape(-1),
    )


def nafnet_apply_fused(params: Dict[str, Any], cfg: NAFNetConfig, inp: jnp.ndarray) -> jnp.ndarray:
    """Functional EnhancedNAFNet forward (NafNet/NafnetModel.py:275-309
    semantics) with Pallas-fused FFN halves."""
    h_in, w_in = inp.shape[1], inp.shape[2]
    inp = pad_to_multiple(inp, cfg.padder_size)

    x = _conv(params["intro"], inp)

    if cfg.multiscale_intro:
        ms = [
            _conv(params[f"multiscale_conv_{i}"], x) for i in range(3)
        ]
        x = _conv(params["fusion"], jnp.concatenate(ms, axis=-1))

    encs = []
    for s, num in enumerate(cfg.enc_blk_nums):
        for b in range(num):
            x = _nafblock(params[f"encoders_{s}_{b}"], x)
        encs.append(x)
        x = _conv(params[f"downs_{s}"], x, stride=2, pad=0)

    for b in range(cfg.middle_blk_num):
        x = _nafblock(params[f"middle_blks_{b}"], x)

    for s in range(len(cfg.dec_blk_nums)):
        x = _conv(params[f"ups_{s}_0"], x)
        x = pixel_shuffle(x, 2)
        skip = encs[-1 - s]
        x = resize_bilinear(x, skip.shape[1:3])
        if cfg.additive_skips:
            x = x + skip
        else:
            x = _conv(params[f"skip_convs_{s}"], jnp.concatenate([x, skip], axis=-1))
        for b in range(cfg.dec_blk_nums[s]):
            x = _nafblock(params[f"decoders_{s}_{b}"], x)

    x = _conv(params["ending"], x)
    x = x + inp
    return x[:, :h_in, :w_in, :]
