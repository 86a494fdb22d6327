"""Canonical building blocks (ONE implementation each; the reference copy-pastes
these into 2-4 files with small divergences — see SURVEY.md section 1).

Layout is NHWC (TPU-native). Compute dtype is configurable (bf16 on TPU);
normalisation statistics are always fp32, mirroring the hybrid's
force-fp32 LayerNorm (hybrid3diffusionspeed.py:109-115) and torch-autocast
behaviour for GroupNorm.

Module/parameter names deliberately mirror the torch state_dict key structure
(dots -> underscores, nn.Sequential indices merged: ``block1.0`` -> ``block1_0``)
so the ``midd_tpu.convert`` weight importer is fully mechanical.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from midd_tpu.ops.attention import mha
from midd_tpu.ops.image import global_avg_pool

Dtype = Any


def tconv(
    features: int,
    kernel: int,
    stride: int = 1,
    pad: Optional[int] = None,
    use_bias: bool = True,
    name: Optional[str] = None,
    dtype: Optional[Dtype] = None,
    quant: Any = False,
    kernel_init: Any = None,
):
    """``nn.Conv`` with torch-style explicit symmetric padding (default k//2).

    Explicit padding matters: XLA 'SAME' places asymmetric padding for stride-2
    kernels, which would silently shift the sampling grid vs torch's
    ``padding=1`` (e.g. the stride-2 3x3 downsamplers at DDIM/DDIMModel.py:195).

    ``quant`` swaps in the int8 ``QuantConv`` (identical params, opt-in
    serving accelerator — midd_tpu.ops.qconv): ``True``/"dynamic" for per-call
    activation scales, "calibrate"/"static" for the calibrated-scale path.
    """
    p = kernel // 2 if pad is None else pad
    if quant:
        from midd_tpu.ops.qconv import QuantConv, quant_mode

        return QuantConv(
            features,
            (kernel, kernel),
            strides=(stride, stride),
            padding=((p, p), (p, p)),
            use_bias=use_bias,
            name=name,
            dtype=dtype,
            mode=quant_mode(quant),
        )
    init_kw = {} if kernel_init is None else {"kernel_init": kernel_init}
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((p, p), (p, p)),
        use_bias=use_bias,
        name=name,
        dtype=dtype,
        **init_kw,
    )


class ConvTransposeTorch(nn.Module):
    """torch ``nn.ConvTranspose2d(in, out, k, stride, padding)`` semantics.

    Implemented as a fractionally-strided conv (input dilated by ``stride``,
    padded by ``k-1-padding``). The kernel parameter ``kernel_t`` is stored in
    conv form, i.e. the torch weight (I,O,kH,kW) transposed to (kH,kW,I,O) and
    spatially flipped — the converter does that transform once at import time.
    Used by DDIM/DDIMModel.py:211, DirectUNetModel.py:204,214,
    hybrid3diffusionspeed.py:495,502.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.param(
            "kernel_t",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, in_ch, self.features),
        )
        dtype = self.dtype or x.dtype
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            k.astype(dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(dtype)
        return y


class GroupNorm32(nn.Module):
    """torch ``nn.GroupNorm(groups, C)`` (eps=1e-5, biased variance), computed
    in fp32 and cast back to the input dtype.

    TPU layout note: the textbook formulation reshapes (..., C) to
    (..., g, C/g) and reduces the trailing pair — but C/g is 6..24 at this
    model family's widths, so the reshape relayouts the WHOLE tensor onto a
     6-wide lane dimension (of 128) twice per call. Measured on v5e at the
    serving shape this made GroupNorm 20% of the UNet forward
    (examples/forward_attribution.py: 4.26 ms of 21.7 ms, of which 2.56 ms
    was the materialized fp32 round-trip). This implementation keeps the big
    tensor channels-minor end to end: spatial moments reduce per channel
    (casts fuse into the reduction, nothing fp32 is materialized), the group
    combine happens on the tiny (B, C) moment arrays, and the normalize is a
    broadcast elementwise chain that XLA fuses into the consumer. Identical
    math — the grand mean/biased variance over (spatial x group) equals the
    equal-count mean of per-channel moments; only fp reassociation differs.

    Pass-count note: variance uses E[x^2] - mean^2 (fp32 accumulators, clamped
    at 0) instead of E[(x-mean)^2]. The centered form makes the var reduction
    depend on the mean reduction — two sequential HBM passes over the tensor —
    while sum and sum-of-squares are independent siblings that XLA
    multi-output-fuses into ONE pass. fp32 catastrophic cancellation is bounded
    by (mean/std)^2 * 2^-24, harmless at activation statistics; parity vs torch
    GroupNorm holds at the suite's 5e-4.
    """

    num_groups: int = 8
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        g = self.num_groups
        cg = c // g
        xf = x.astype(jnp.float32)
        spatial = tuple(range(1, x.ndim - 1))

        def per_channel_to_full(m_c: jnp.ndarray) -> jnp.ndarray:
            # (B, C) channel moments -> equal-count group moments,
            # broadcast back to (B, 1, ..., 1, C)
            m_g = m_c.reshape(m_c.shape[0], g, cg).mean(axis=-1)
            m = jnp.repeat(m_g, cg, axis=-1)
            return m.reshape((x.shape[0],) + (1,) * (x.ndim - 2) + (c,))

        mean = per_channel_to_full(jnp.mean(xf, axis=spatial))
        m2 = per_channel_to_full(jnp.mean(jnp.square(xf), axis=spatial))
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
        out = (xf - mean) / jnp.sqrt(var + self.epsilon) * scale + bias
        return out.astype(x.dtype)


class LayerNorm2d(nn.Module):
    """NAFNet channel LayerNorm (NafNet/NafnetModel.py:159-172): per-pixel
    statistics over the channel axis, biased variance, eps=1e-6, forced fp32
    (the hybrid variant, hybrid3diffusionspeed.py:101-115 — numerically
    identical in fp32, and the safe choice under bf16).

    Variance is one-pass E[x^2]-mean^2 like GroupNorm32 (worth ~4 ms on the
    b8 512^2 NAFNet forward). A fused Pallas kernel was built and measured
    SLOWER than this XLA form at every NAFNet stage (ops/ln2d.py keeps the
    kernel + the decision record; examples/ln_kernel_bench.py is the
    per-stage evidence) — XLA fuses the normalize+affine into the consumer
    conv, so the only real LN cost left is the C=32 stage's HBM lane-padding,
    which no same-layout kernel can remove."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        u = xf.mean(axis=-1, keepdims=True)
        s = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(u), 0.0
        )
        out = (xf - u) / jnp.sqrt(s + self.epsilon) * scale + bias
        return out.astype(x.dtype)


def simple_gate(x: jnp.ndarray) -> jnp.ndarray:
    """NAFNet SimpleGate (NafNet/NafnetModel.py:175-178): split channels in
    half, multiply."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2


class NAFBlock(nn.Module):
    """NAFNet block (NafNet/NafnetModel.py:181-229).

    norm1 -> 1x1 expand(x2) -> 3x3 depthwise -> SimpleGate -> *SCA -> 1x1 ->
    +beta*residual; then norm2 -> 1x1 FFN(x2) -> SimpleGate -> 1x1 ->
    +gamma*residual. Dropout rate is 0 in every reference config.
    """

    dw_expand: int = 2
    ffn_expand: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        c = inp.shape[-1]
        dw = c * self.dw_expand
        dt = self.dtype

        x = LayerNorm2d(name="norm1")(inp)
        x = tconv(dw, 1, name="conv1", dtype=dt)(x)
        x = nn.Conv(
            dw,
            (3, 3),
            padding=((1, 1), (1, 1)),
            feature_group_count=dw,
            name="conv2",
            dtype=dt,
        )(x)
        x = simple_gate(x)
        sca = tconv(dw // 2, 1, name="sca_1", dtype=dt)(global_avg_pool(x))
        x = x * sca
        x = tconv(c, 1, name="conv3", dtype=dt)(x)

        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
        y = inp + x * beta.astype(x.dtype)

        x = LayerNorm2d(name="norm2")(y)
        x = tconv(self.ffn_expand * c, 1, name="conv4", dtype=dt)(x)
        x = simple_gate(x)
        x = tconv(c, 1, name="conv5", dtype=dt)(x)

        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, c))
        return y + x * gamma.astype(x.dtype)


def sinusoidal_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """SinusoidalPositionEmbeddings (DDIM/DDIMModel.py:94-106): fp32,
    freq = exp(arange(half) * -ln(10000)/(half-1)), cat(sin, cos)."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1))
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ResidualBlock(nn.Module):
    """Diffusion-UNet residual block (DDIM/DDIMModel.py:108-133):
    (GN8+SiLU+3x3) -> +time-emb -> (GN8+SiLU+Dropout+3x3) -> +res_conv(x)."""

    out_c: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    quant: Any = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t_emb: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        in_c = x.shape[-1]
        dt = self.dtype
        q = self.quant
        h = GroupNorm32(name="block1_0")(x)
        h = nn.silu(h)
        h = tconv(self.out_c, 3, name="block1_2", dtype=dt, quant=q)(h)

        te = nn.Dense(self.out_c, name="time_mlp_1", dtype=dt)(nn.silu(t_emb))
        h = h + te[:, None, None, :].astype(h.dtype)

        h = GroupNorm32(name="block2_0")(h)
        h = nn.silu(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = tconv(self.out_c, 3, name="block2_3", dtype=dt, quant=q)(h)

        res = x if in_c == self.out_c else tconv(self.out_c, 1, name="res_conv", dtype=dt, quant=q)(x)
        return h + res


class AttentionBlock(nn.Module):
    """Spatial self-attention (DDIM/DDIMModel.py:135-166): GN8 -> 1x1 qkv ->
    2-head exact softmax attention over h*w tokens -> 1x1 proj -> +x."""

    num_heads: int = 2
    use_flash: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        xn = GroupNorm32(name="norm")(x)
        qkv = tconv(3 * c, 1, name="qkv", dtype=self.dtype)(xn)
        hd = c // self.num_heads
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = mha(q, k, v, use_flash=self.use_flash)
        out = out.reshape(b, h, w, c)
        out = tconv(c, 1, name="proj", dtype=self.dtype)(out)
        return out + x
