"""Dynamic int8 quantized convolution — the opt-in serving accelerator.

TPU v5e's MXU runs int8 at 2x the bf16 rate; the exact bf16 rollout is lane-
padding-bound (ROADMAP.md perf model), so int8 is the one lever that moves
conv-bound time without changing the architecture. Measured standalone on
v5e: 2.3x at 256²x48, 1.5x at 32²x192 per conv.

Scheme (standard dynamic symmetric quantization):
- weights: per-OUTPUT-CHANNEL symmetric scales, s_c = max|w[...,c]| / 127;
  quantized at trace time from the same fp32 "kernel" param ``nn.Conv`` uses,
  so any checkpoint (orbax or converted .pth) loads unchanged and XLA
  constant-folds the weight quantization for captured serving params;
- activations: per-tensor dynamic scale (abs-max), re-measured every call;
- int8 x int8 -> int32 accumulation on the MXU, fp32 dequant + bias.

Quality is NOT exact: the path is opt-in (``EngineConfig.quantize_int8``) and
gated on the xraybench-v1 ground-truth benchmark (PARITY.md). Reference
equivalent: none (the reference serves fp16 autocast; this is the TPU-native
speed/quality knob it lacks).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class QuantConv(nn.Module):
    """Drop-in for ``nn.Conv`` (identical param names/shapes/inits) running
    dynamic int8. ``dtype`` is the dequantized output dtype."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, in_c, self.features),
        )
        kf = kernel.astype(jnp.float32)
        w_s = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-8) / 127.0
        wq = jnp.round(kf / w_s).astype(jnp.int8)

        xf = x.astype(jnp.float32)
        a_s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / a_s), -127, 127).astype(jnp.int8)

        y = jax.lax.conv_general_dilated(
            xq,
            wq,
            self.strides,
            self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        out = y.astype(jnp.float32) * (a_s * w_s)  # broadcast over channels
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out.astype(self.dtype) if self.dtype is not None else out
