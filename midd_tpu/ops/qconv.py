"""Int8 quantized convolution — the opt-in serving accelerator.

MEASURED OUTCOME (v5e-lite, scan-amortized harness — examples/
int8_microbench.py): int8 conv buys only 1.16–1.28x per conv at the
rollout's shapes (not the nominal 2x MXU rate), and at the full-UNet level
the static path is ~11% SLOWER than bf16 (23.8 vs 21.4 ms/fwd at 256² b8) —
the quantize/dequant passes around the fp32 GroupNorms eat more than the MXU
saves. An earlier "2.3x standalone per conv" reading was a dispatch-overhead
artifact (~30 ms tunnel round-trip per call). The module stays as the
honest, tested opt-in; ROADMAP.md records the decision not to adopt.

Two activation-scale modes:

- **dynamic** (round-2 v1): per-tensor abs-max re-measured every call. The
  measurement showed this LOSES end-to-end despite the int8 MXU rate: each
  conv pays a full-tensor reduction (an extra HBM pass that XLA cannot fuse
  with anything) plus a serialization point before the quantize pass.
- **static** (round-2 v2): activation scales are CALIBRATED once offline by
  running representative rollouts in ``calibrate`` mode (running abs-max per
  conv, stored in the ``qscales`` variable collection) and then frozen. At
  serve time the scale is a captured constant: the quantize is a pure
  elementwise op XLA fuses into the producer's epilogue, the int8 tensor is
  half the bytes of bf16 on the conv's HBM read, and no reduction exists.

Weight scales are always per-OUTPUT-CHANNEL symmetric, s_c = max|w[...,c]|/127,
computed at trace time from the same fp32 "kernel" param ``nn.Conv`` uses —
any checkpoint (orbax or converted .pth) loads unchanged, and XLA constant-
folds the weight quantization for captured serving params. int8 x int8 ->
int32 accumulation on the MXU, fp32 dequant + bias.

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

#: collection name for calibrated activation abs-max values
QSCALES = "qscales"


class QuantConv(nn.Module):
    """Drop-in for ``nn.Conv`` (identical param names/shapes/inits) running
    int8. ``dtype`` is the dequantized output dtype.

    ``mode``:
      - ``"dynamic"``: per-call abs-max activation scale (no calibration
        needed; slower — see module docstring).
      - ``"calibrate"``: runs the EXACT fp32 conv while recording the running
        activation abs-max into the ``qscales`` collection (apply with
        ``mutable=["qscales"]`` and thread the returned collection through
        subsequent calls to accumulate).
      - ``"static"``: quantizes with the frozen calibrated scale; requires a
        ``qscales`` collection in the variables (from a calibration pass).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    mode: str = "dynamic"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, in_c, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )

        if self.mode == "calibrate":
            # exact fp32 conv so the calibration trajectory matches the
            # full-precision rollout; record the running abs-max.
            obs = self.variable(
                QSCALES, "act_absmax", lambda: jnp.zeros((), jnp.float32)
            )
            obs.value = jnp.maximum(
                obs.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
            )
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.float32),
                kernel.astype(jnp.float32),
                self.strides,
                self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + bias
            return y.astype(self.dtype) if self.dtype is not None else y

        kf = kernel.astype(jnp.float32)
        w_s = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-8) / 127.0
        wq = jnp.round(kf / w_s).astype(jnp.int8)

        if self.mode == "static":
            if not self.has_variable(QSCALES, "act_absmax"):
                raise ValueError(
                    "QuantConv(mode='static') needs a calibrated 'qscales' "
                    "collection — run a mode='calibrate' pass first "
                    "(midd_tpu.ops.qconv.calibrate_unet_rollout)."
                )
            absmax = self.get_variable(QSCALES, "act_absmax")
            a_s = jnp.maximum(absmax.astype(jnp.float32), 1e-8) / 127.0
        else:  # dynamic
            a_s = (
                jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8)
                / 127.0
            )
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / a_s), -127, 127
        ).astype(jnp.int8)

        y = jax.lax.conv_general_dilated(
            xq,
            wq,
            self.strides,
            self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        out = y.astype(jnp.float32) * (a_s * w_s)  # broadcast over channels
        if bias is not None:
            out = out + bias
        return out.astype(self.dtype) if self.dtype is not None else out


def quant_mode(quant: Any) -> str:
    """Normalise the model-level ``quant`` flag: True -> 'dynamic' (round-2 v1
    back-compat), else the mode string itself. Unknown strings raise —
    QuantConv's branch chain would otherwise silently serve a typo (e.g.
    'staic') on the slower dynamic path."""
    mode = "dynamic" if quant is True else str(quant)
    if mode not in ("dynamic", "static", "calibrate"):
        raise ValueError(
            f"unknown int8 quant mode {mode!r}: expected one of "
            "'dynamic', 'static', 'calibrate' (or True for dynamic)"
        )
    return mode


def calibrate_unet_rollout(
    unet,
    variables,
    schedule,
    noisy_batches,
    inference_steps: int,
    qscales=None,
):
    """Collect per-conv activation abs-max over full deterministic rollouts.

    ``unet`` must be constructed with ``quant='calibrate'``. Runs the same
    python-loop DDIM update as ``diffusion.sampler.denoise`` (eps clamp
    [-5,5], posterior mean, x clamp [0,1] — DDIM/DDIMModel.py:268-289) for
    every batch in ``noisy_batches``, threading the ``qscales`` collection so
    the running max accumulates across steps AND batches. Returns the final
    qscales tree to serve with ``quant='static'``.
    """
    from midd_tpu.diffusion.schedule import timestep_sequence

    ts = timestep_sequence(schedule.noise_steps, inference_steps)
    alpha = jax.device_get(schedule.alpha)
    alpha_hat = jax.device_get(schedule.alpha_hat)

    @jax.jit
    def fwd(v, x, cond, t_b):
        return unet.apply(v, x, cond, t_b, mutable=[QSCALES])

    for noisy in noisy_batches:
        noisy = jnp.asarray(noisy, jnp.float32)
        batch = noisy.shape[0]
        x = noisy
        for t in ts:
            v = dict(variables)
            if qscales is not None:
                v[QSCALES] = qscales
            t_b = jnp.full((batch,), int(t), jnp.int32)
            eps, mut = fwd(v, x, noisy, t_b)
            qscales = mut[QSCALES]
            eps = jnp.clip(eps.astype(jnp.float32), -5.0, 5.0)
            a, ah = float(alpha[t]), float(alpha_hat[t])
            mean = (x - ((1.0 - a) / float(jnp.sqrt(1.0 - ah))) * eps) / float(
                jnp.sqrt(a)
            )
            x = jnp.clip(mean, 0.0, 1.0)
    return qscales


def merge_qscales(a, b):
    """Elementwise max of two qscales trees (union of calibration runs)."""
    if a is None:
        return b
    if b is None:
        return a
    return jax.tree_util.tree_map(jnp.maximum, a, b)
