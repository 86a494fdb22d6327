"""Hybrid routing components and the fused hybrid graph.

Re-design of hybrid/hybrid3diffusionspeed.py:470-628. The reference runs the
NAFNet and an 8-step diffusion rollout under no_grad, then a trainable router
mask and fusion conv — as four separate eager dispatches. Here the whole thing
is ONE jittable fan-out DAG (``hybrid_forward``): XLA sees
fusion(nafnet(x), scan_denoise(x), router(x)) and schedules it as a single
program; the sampling loop is a ``lax.scan`` (midd_tpu.diffusion.sampler).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from midd_tpu.config import FusionConfig, HybridConfig, RouterConfig
from midd_tpu.models.blocks import ConvTransposeTorch, GroupNorm32, tconv
from midd_tpu.ops.image import resize_bilinear


def _gelu(x):
    return nn.gelu(x, approximate=False)  # torch nn.GELU() default (exact erf)


class NoiseAnalyzer(nn.Module):
    """Routing-mask UNet (hybrid3diffusionspeed.py:470-534): 3-level
    GroupNorm+GELU encoder, ConvTranspose ups with skip concats, 1x1 +
    sigmoid per-pixel mask."""

    cfg: RouterConfig = RouterConfig()
    dtype: Optional[Any] = None

    def _block(self, x, feats, prefix, stride=1):
        x = tconv(feats, 3, stride=stride, name=f"{prefix}_0", dtype=self.dtype)(x)
        x = GroupNorm32(num_groups=8, name=f"{prefix}_1")(x)
        return _gelu(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bc = self.cfg.base_c
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)

        e1 = self._block(x, bc, "enc1")
        e2 = self._block(e1, bc * 2, "enc2", stride=2)
        e3 = self._block(e2, bc * 4, "enc3", stride=2)

        m = self._block(e3, bc * 4, "mid")

        d3 = ConvTransposeTorch(bc * 2, 2, 2, 0, name="up3", dtype=dt)(m)
        d3 = resize_bilinear(d3, e2.shape[1:3])
        d3 = self._block(jnp.concatenate([d3, e2], axis=-1), bc * 2, "dec3")

        d2 = ConvTransposeTorch(bc, 2, 2, 0, name="up2", dtype=dt)(d3)
        d2 = resize_bilinear(d2, e1.shape[1:3])
        d2 = self._block(jnp.concatenate([d2, e1], axis=-1), bc, "dec2")

        d2 = resize_bilinear(d2, x.shape[1:3])
        return nn.sigmoid(tconv(self.cfg.out_c, 1, name="out_conv", dtype=dt)(d2))


class FusionModule(nn.Module):
    """Fusion epilogue (hybrid3diffusionspeed.py:537-557):
    cat([fast, hq, mask]) -> 3x3(48)+GN8+GELU -> 3x3(24)+GN4+GELU -> 1x1.

    ``cfg.residual=True`` (TPU-native variant, see FusionConfig): the 1x1
    head is zero-initialised and its output ADDED to the NAFNet branch, so
    the module computes a learned correction instead of a full synthesis."""

    cfg: FusionConfig = FusionConfig()
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        nafnet_out: jnp.ndarray,
        diffusion_out: jnp.ndarray,
        routing_mask: jnp.ndarray,
        expert_out: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        bc = self.cfg.base_c
        dt = self.dtype
        ins = [nafnet_out, diffusion_out, routing_mask]
        if self.cfg.sees_expert:
            if expert_out is None:
                raise ValueError(
                    "FusionConfig.sees_expert=True requires the expert branch"
                )
            ins.append(expert_out)
        x = jnp.concatenate(ins, axis=-1)
        if dt is not None:
            x = x.astype(dt)
        x = tconv(bc, 3, name="conv1_0", dtype=dt)(x)
        x = GroupNorm32(num_groups=8, name="conv1_1")(x)
        x = _gelu(x)
        x = tconv(bc // 2, 3, name="conv2_0", dtype=dt)(x)
        x = GroupNorm32(num_groups=4, name="conv2_1")(x)
        x = _gelu(x)
        if self.cfg.residual:
            delta = tconv(
                self.cfg.out_c, 1, name="out_conv", dtype=dt,
                kernel_init=nn.initializers.zeros,
            )(x)
            return nafnet_out.astype(delta.dtype) + delta
        return tconv(self.cfg.out_c, 1, name="out_conv", dtype=dt)(x)


def _sanitize(x: jnp.ndarray) -> jnp.ndarray:
    """nan_to_num(nan=0, posinf=1, neginf=0) + clamp [0,1]
    (hybrid3diffusionspeed.py:613-624)."""
    x = jnp.nan_to_num(x, nan=0.0, posinf=1.0, neginf=0.0)
    return jnp.clip(x, 0.0, 1.0)


def hybrid_forward(
    nafnet_apply,
    denoise_fn,
    router_apply,
    fusion_apply,
    noisy: jnp.ndarray,
    stop_backend_grads: bool = True,
    expert_apply=None,
) -> jnp.ndarray:
    """The fused hybrid DAG (hybrid3diffusionspeed.py:610-628).

    ``nafnet_apply(noisy)``, ``denoise_fn(noisy)`` (a scan-compiled sampler at
    the configured step count), ``router_apply(noisy)`` and
    ``fusion_apply(fast, hq, mask)`` are closures over their own params.
    ``stop_backend_grads`` reproduces the reference's frozen-backend no_grad
    (only router+fusion train, hybrid3diffusionspeed.py:613-620,669).

    ``expert_apply`` (TPU-native variant, FusionConfig.sees_expert): a third
    frozen branch fed to the fusion — fusion_apply is then called with
    ``(fast, hq, mask, exp)``.
    """
    fast = _sanitize(nafnet_apply(noisy))
    hq = _sanitize(denoise_fn(noisy))
    exp = _sanitize(expert_apply(noisy)) if expert_apply is not None else None
    if stop_backend_grads:
        fast = jax.lax.stop_gradient(fast)
        hq = jax.lax.stop_gradient(hq)
        if exp is not None:
            exp = jax.lax.stop_gradient(exp)
    mask = _sanitize(router_apply(noisy))
    if exp is not None:
        return fusion_apply(fast, hq, mask, exp)
    return fusion_apply(fast, hq, mask)
