"""EnhancedNAFNet — the fast restoration path.

Re-design of the reference EnhancedNAFNet (NafNet/NafnetModel.py:232-309, with
the unused multi-scale/additive-skip variant Backend/model2.py:80-153 behind
config flags). NHWC, fp32-norm/bf16-capable, single canonical NAFBlock.

Topology (width W, enc (2,2,4,6), dec (2,2,2,2), mid 8 == serving preset):
intro 3x3 -> 4x[NAFBlocks, skip, 2x2/s2 down] -> 8 middle NAFBlocks ->
4x[1x1 (bias-free) + PixelShuffle(2) up, concat skip, 1x1 skip_conv, NAFBlocks]
-> ending 3x3 -> +input residual -> crop. Input padded to a multiple of
2**len(enc) (NafNet/NafnetModel.py:304-309).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from midd_tpu.config import NAFNetConfig
from midd_tpu.models.blocks import NAFBlock, tconv
from midd_tpu.ops.image import pad_to_multiple, pixel_shuffle, resize_bilinear


class EnhancedNAFNet(nn.Module):
    """``s2d_stage0``: run the C=width stage (the full-resolution encoder 0 /
    last decoder stage) in a 2x2 space-to-depth layout so its tensors fill
    the 128 TPU lanes instead of padding 32 -> 128 — numerically equivalent,
    same param tree (ops/naf_s2d.py has the op-by-op construction and the
    rationale). A LAYOUT choice like ``dtype``, not architecture: it never
    enters checkpoint metadata."""

    cfg: NAFNetConfig = NAFNetConfig()
    dtype: Optional[Any] = None
    s2d_stage0: bool = False

    @nn.compact
    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dt = self.dtype
        h_in, w_in = inp.shape[1], inp.shape[2]

        # s2d requires the plain concat-skip topology and a symmetric
        # enc/dec so the last decoder stage consumes the s2d-resident
        # encoder-0 skip (the serving preset; variant configs fall back)
        use_s2d = (
            self.s2d_stage0
            and not cfg.multiscale_intro
            and not cfg.additive_skips
            and len(cfg.enc_blk_nums) == len(cfg.dec_blk_nums)
            and len(cfg.enc_blk_nums) >= 1
        )
        if use_s2d:
            from midd_tpu.ops.naf_s2d import (
                Down2S2D,
                NAFBlockS2D,
                SkipConvS2D,
                UpS2D,
                ds2,
                s2d,
            )

        inp = pad_to_multiple(inp, cfg.padder_size)
        if dt is not None:
            inp = inp.astype(dt)

        x = tconv(cfg.width, 3, name="intro", dtype=dt)(inp)

        if cfg.multiscale_intro:  # model2.py:109-127
            ms = [
                tconv(cfg.width, k, name=f"multiscale_conv_{i}", dtype=dt)(x)
                for i, k in enumerate((3, 5, 7))
            ]
            x = tconv(cfg.width, 1, name="fusion", dtype=dt)(
                jnp.concatenate(ms, axis=-1)
            )

        encs = []
        chan = cfg.width
        for s, num in enumerate(cfg.enc_blk_nums):
            if s == 0 and use_s2d:
                xs = s2d(x)
                for b in range(num):
                    xs = NAFBlockS2D(name=f"encoders_0_{b}", dtype=dt)(xs)
                encs.append(xs)  # stored in s2d layout
                x = Down2S2D(2 * chan, name="downs_0", dtype=dt)(xs)
                chan *= 2
                continue
            for b in range(num):
                x = NAFBlock(name=f"encoders_{s}_{b}", dtype=dt)(x)
            encs.append(x)
            x = tconv(2 * chan, 2, stride=2, pad=0, name=f"downs_{s}", dtype=dt)(x)
            chan *= 2

        for b in range(cfg.middle_blk_num):
            x = NAFBlock(name=f"middle_blks_{b}", dtype=dt)(x)

        for s in range(len(cfg.dec_blk_nums)):
            last = s == len(cfg.dec_blk_nums) - 1
            if last and use_s2d:
                # 1x1 + pixel_shuffle == one output-permuted 1x1 that lands
                # directly in s2d layout; skip is s2d-resident already
                # (spatial match is structural: padder_size >= 4)
                xs = UpS2D(chan * 2, name=f"ups_{s}_0", dtype=dt)(x)
                chan //= 2
                xs = SkipConvS2D(chan, name=f"skip_convs_{s}", dtype=dt)(
                    jnp.concatenate([xs, encs[0]], axis=-1)
                )
                for b in range(cfg.dec_blk_nums[s]):
                    xs = NAFBlockS2D(name=f"decoders_{s}_{b}", dtype=dt)(xs)
                x = ds2(xs)
                continue
            x = tconv(chan * 2, 1, use_bias=False, name=f"ups_{s}_0", dtype=dt)(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            skip = encs[-1 - s]
            x = resize_bilinear(x, skip.shape[1:3])
            if cfg.additive_skips:  # model2.py:138-141
                x = x + skip
            else:
                x = tconv(chan, 1, name=f"skip_convs_{s}", dtype=dt)(
                    jnp.concatenate([x, skip], axis=-1)
                )
            for b in range(cfg.dec_blk_nums[s]):
                x = NAFBlock(name=f"decoders_{s}_{b}", dtype=dt)(x)

        x = tconv(cfg.img_channel, 3, name="ending", dtype=dt)(x)
        x = x + inp  # global residual (NafNet/NafnetModel.py:300)
        return x[:, :h_in, :w_in, :]
