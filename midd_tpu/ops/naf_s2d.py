"""Space-to-depth stage-0 layout for EnhancedNAFNet — the structural fix for
the C=32 lane-padding tax (round-3 attribution; round-3 verdict item 3).

The problem being fixed: NAFNet's widest stage runs 32-channel tensors at
full resolution, and the TPU lane dimension is 128 — every elementwise op,
norm, and 1x1 conv at stage 0 moves ~4x its logical bytes
(examples/naf_component_attribution.py measured LayerNorm alone at ~35% of
the b8 512² forward). The fix: run stage 0 in a space-to-depth layout —
(B, H, W, 32) becomes (B, H/2, W/2, 128), PHASE-MAJOR lanes
(lane = phase*32 + channel, phase = 2*(dy%2) + (dx%2)) — so stage-0 tensors
fill the lanes exactly.

Why this is NOT the "dense restructurings conserve padding waste" trap the
round-2 ROADMAP note closed: that argument holds K*N padded work constant at
fixed M. Space-to-depth SHRINKS M 4x while K/N were already padded to 128,
so the block-diagonal 1x1 kernels (kron(I4, W)) waste nothing that padding
had not already wasted: per 1x1 conv the padded MXU work drops 2-4x, and
elementwise/norm bytes drop ~4x.

Every op here is numerically EQUIVALENT to the plain layout (weights are the
SAME param tree — layout is internal, checkpoints interchange; asserted by
tests/test_naf_s2d.py):

- 1x1 convs      -> block-diagonal 1x1 over 4C lanes (kron(I4, W));
- SimpleGate     -> per-phase-block halves product (static lane slices);
- SCA            -> global pool + phase-average (tiny), 1x1 on (B,1,1,C),
                    tile back over phases;
- LayerNorm2d    -> per-phase-block moments (the per-pixel channel stats);
- downs_0        -> the 2x2/s2 conv consumes exactly one s2d cell: a dense
                    1x1 in s2d layout (kernel reshaped), exits to stage-1's
                    normal layout for free;
- ups_last + pixel_shuffle -> one 1x1 conv with output channels permuted to
                    phase-major: its output IS the s2d tensor (no shuffle);
- 3x3 depthwise  -> the one op whose neighborhoods cross s2d cells: computed
                    in the original layout between a ds2/s2d sandwich (XLA
                    lowers depthwise well — attribution: 0.3 ms/call; the
                    in-s2d dense alternative costs 5x the MXU work).

Reference topology being preserved: NafNet/NafnetModel.py:181-309.

DECISION RECORD (round 4, measured on TPU v5e-lite, naf_s2d_bench.json):
the layout is a clear NAFNet-forward win — 512² b8 110.0 -> 82.5 ms
(1.33x), b1 13.8 -> 11.0 ms (1.26x) — but the all-4 endpoint request moves
only 281.3 -> 273.6 ms (+2.8%): NAFNet is ~15% of the request's device
work, so the verdict's >=10%-endpoint adoption bar is not met.
``EngineConfig.nafnet_s2d`` stays a measured OPT-IN (exactly the int8
pattern): adopt it for NAFNet-heavy deployments (the standalone fast path,
batch restoration pipelines), skip it when the request mix is
rollout-dominated. Equivalence is asserted at block, model, and engine
level in tests/test_naf_s2d.py, so flipping the flag is quality-free.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

PHASES = 4  # 2x2 space-to-depth


def s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major lanes."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, PHASES * c)


def ds2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`s2d`."""
    b, h, w, pc = x.shape
    c = pc // PHASES
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def gate_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """SimpleGate in s2d layout: per-phase contiguous halves product.
    (..., 4*dw) phase-major -> (..., 4*dw/2) phase-major."""
    dw = x.shape[-1] // PHASES
    half = dw // 2
    parts = [
        x[..., p * dw : p * dw + half] * x[..., p * dw + half : (p + 1) * dw]
        for p in range(PHASES)
    ]
    return jnp.concatenate(parts, axis=-1)


def _tile_phases(v: jnp.ndarray) -> jnp.ndarray:
    """(..., C) -> (..., 4C) phase-major broadcast (repeat the C block)."""
    reps = (1,) * (v.ndim - 1) + (PHASES,)
    return jnp.tile(v, reps)


class LayerNorm2dS2D(nn.Module):
    """LayerNorm2d (per-ORIGINAL-pixel channel stats, fp32, eps 1e-6) on a
    phase-major s2d tensor: moments per contiguous phase block. Same params
    (scale/bias over the logical C) as blocks.LayerNorm2d."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1] // PHASES
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        outs = []
        for p in range(PHASES):
            blk = xf[..., p * c : (p + 1) * c]
            u = blk.mean(axis=-1, keepdims=True)
            s = jnp.maximum(
                jnp.mean(jnp.square(blk), axis=-1, keepdims=True)
                - jnp.square(u),
                0.0,
            )
            outs.append((blk - u) / jnp.sqrt(s + self.epsilon) * scale + bias)
        return jnp.concatenate(outs, axis=-1).astype(x.dtype)


class BlockDiag1x1(nn.Module):
    """A logical 1x1 conv (C_in -> C_out) applied in s2d layout as a dense
    (4C_in -> 4C_out) matmul with kron(I4, W) — the zeros occupy lanes that
    padding had already wasted, and M shrinks 4x. Params identical to
    ``nn.Conv(features=C_out, kernel=(1,1))``."""

    out_c: int
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_c = x.shape[-1] // PHASES
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, in_c, self.out_c)
        )
        dt = self.dtype or x.dtype
        eye = jnp.eye(PHASES, dtype=k.dtype)
        kd = jnp.kron(eye, k[0, 0])  # (4*in_c, 4*out_c), phase-major both
        y = jax.lax.dot_general(
            x.astype(dt), kd.astype(dt),
            (((x.ndim - 1,), (0,)), ((), ())),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_c,))
            y = y + _tile_phases(b).astype(dt)
        return y


class DepthwiseS2D(nn.Module):
    """The 3x3 depthwise conv — its neighborhoods cross s2d cells, so it runs
    in the original layout between a ds2/s2d sandwich (XLA's depthwise
    lowering is cheap; the all-lanes dense 2x2 alternative costs ~5x the MXU
    work). Params identical to ``nn.Conv(dw, (3,3), feature_group_count=dw)``."""

    dw: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 1, self.dw)
        )
        b = self.param("bias", nn.initializers.zeros, (self.dw,))
        dt = self.dtype or xs.dtype
        x = ds2(xs)
        y = jax.lax.conv_general_dilated(
            x.astype(dt),
            k.astype(dt),
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            feature_group_count=self.dw,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + b.astype(dt)
        return s2d(y)


class NAFBlockS2D(nn.Module):
    """NAFBlock on a phase-major s2d tensor — same param tree as
    blocks.NAFBlock (checkpoints interchange)."""

    dw_expand: int = 2
    ffn_expand: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        from midd_tpu.models.blocks import tconv

        c = inp.shape[-1] // PHASES
        dw = c * self.dw_expand
        dt = self.dtype

        x = LayerNorm2dS2D(name="norm1")(inp)
        x = BlockDiag1x1(dw, name="conv1", dtype=dt)(x)
        x = DepthwiseS2D(dw, name="conv2", dtype=dt)(x)
        x = gate_s2d(x)
        # SCA: per-channel global pool == pool over s2d spatial, then average
        # the 4 phases (tiny tensors throughout)
        g = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        pooled = g.reshape(g.shape[0], 1, 1, PHASES, dw // 2).mean(axis=3)
        sca = tconv(dw // 2, 1, name="sca_1", dtype=dt)(pooled.astype(x.dtype))
        x = x * _tile_phases(sca)
        x = BlockDiag1x1(c, name="conv3", dtype=dt)(x)

        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
        y = inp + x * _tile_phases(beta).astype(x.dtype)

        x = LayerNorm2dS2D(name="norm2")(y)
        x = BlockDiag1x1(self.ffn_expand * c, name="conv4", dtype=dt)(x)
        x = gate_s2d(x)
        x = BlockDiag1x1(c, name="conv5", dtype=dt)(x)

        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, c))
        return y + x * _tile_phases(gamma).astype(x.dtype)


class Down2S2D(nn.Module):
    """The stage-0 2x2/stride-2 downsampler consumes exactly one s2d cell
    per output pixel: a dense 1x1 in s2d layout. EXITS s2d — output is
    stage 1's normal layout. Params identical to
    ``nn.Conv(out_c, (2,2), strides=2, padding=0)``."""

    out_c: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        in_c = xs.shape[-1] // PHASES
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, in_c, self.out_c)
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_c,))
        dt = self.dtype or xs.dtype
        # (2,2,in,out) C-order reshape: row (r1*2+r2)*in_c + c == phase-major
        kd = k.reshape(PHASES * in_c, self.out_c)
        y = jax.lax.dot_general(
            xs.astype(dt), kd.astype(dt),
            (((xs.ndim - 1,), (0,)), ((), ())),
        )
        return y + b.astype(dt)


class UpS2D(nn.Module):
    """The last decoder upsampler (1x1 conv to 4*C_out + PixelShuffle(2)):
    the pre-shuffle channels ARE the s2d phases up to channel order
    (pixel_shuffle reads (c, r1, r2)-major, NafNet/NafnetModel.py:264-267),
    so one output-permuted 1x1 conv ENTERS s2d with no shuffle at all.
    Params identical to ``nn.Conv(4*C_out, (1,1), use_bias=False)``."""

    out_total: int  # == 4 * C_out (the plain conv's feature count)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_c = x.shape[-1]
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, in_c, self.out_total)
        )
        dt = self.dtype or x.dtype
        c_out = self.out_total // PHASES
        # plain output index = c*4 + p  ->  s2d lane = p*c_out + c
        kp = (
            k[0, 0]
            .reshape(in_c, c_out, PHASES)
            .transpose(0, 2, 1)
            .reshape(in_c, self.out_total)
        )
        return jax.lax.dot_general(
            x.astype(dt), kp.astype(dt),
            (((x.ndim - 1,), (0,)), ((), ())),
        )


class SkipConvS2D(nn.Module):
    """The last decoder's skip_conv (1x1 on concat([up, skip], C)) with both
    inputs in s2d layout: block-diagonal over the two 4C blocks. Params
    identical to ``nn.Conv(out_c, (1,1))``."""

    out_c: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        in_tot = xs.shape[-1] // PHASES  # logical concat width (2*out_c)
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, in_tot, self.out_c)
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_c,))
        dt = self.dtype or xs.dtype
        half = in_tot // 2
        eye = jnp.eye(PHASES, dtype=k.dtype)
        kd = jnp.concatenate(
            [jnp.kron(eye, k[0, 0, :half]), jnp.kron(eye, k[0, 0, half:])],
            axis=0,
        )  # (2*4*half, 4*out_c)
        y = jax.lax.dot_general(
            xs.astype(dt), kd.astype(dt),
            (((xs.ndim - 1,), (0,)), ((), ())),
        )
        return y + _tile_phases(b).astype(dt)
