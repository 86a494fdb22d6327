"""Attribute the serving UNet's forward time to component classes (TPU).

bench.py's MFU line says the DDIM-50 rollout achieves 24% model-FLOP MFU and
45.9% of the lane-padded envelope — so ~half the step time is NOT MXU work
even after granting the padding. This harness locates that time by compiling
forward variants with one component class stubbed at a time (semantics
deliberately broken — this is a TIMING attribution, never a serving path):

  base        exact serving forward (flash attention, bf16, fp32 norms)
  attn_xla    flash -> XLA attention (the known ~3% delta, sanity anchor)
  no_attn     AttentionBlock -> identity
  no_resize   decoder shape-fix resize_bilinear -> crop-or-pad
  gn_affine   GroupNorm32 -> affine only (no stats, no fp32 round-trip)
  gn_lowp     GroupNorm32 stats in input dtype (isolates the fp32 upcast)
  no_upconv   ConvTransposeTorch -> nearest-x2 + 1x1 conv
  convs_only  no_attn + no_resize + gn_affine + no_upconv (conv-stack floor)

Same scan-20 harness as examples/int8_microbench.py (one dispatch per timing,
~30 ms tunnel RTT amortized out, dtype-preserving input perturbation).
Writes forward_attribution.json.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Optional

import numpy as np

N_SCAN = 20
N_TIMED = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset to run (base always runs)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from midd_tpu import config
    from midd_tpu.models import blocks as B
    from midd_tpu.models import unet_diffusion as U
    from midd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    log(f"device: {dev}")
    on_tpu = dev.platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else None

    batch, size = args.batch, args.size

    # ---- stubs -----------------------------------------------------------
    class IdAttention(nn.Module):
        num_heads: int = 2
        use_flash: bool = False
        dtype: Optional[Any] = None

        @nn.compact
        def __call__(self, x):
            return x

    class AffineGroupNorm(nn.Module):
        num_groups: int = 8
        epsilon: float = 1e-5

        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            return x * scale.astype(x.dtype) + bias.astype(x.dtype)

    class LowpGroupNorm(nn.Module):
        """GroupNorm with statistics in the INPUT dtype (no fp32 round-trip)."""

        num_groups: int = 8
        epsilon: float = 1e-5

        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            g = self.num_groups
            xg = x.reshape(x.shape[:-1] + (g, c // g))
            red = tuple(range(1, x.ndim - 1)) + (x.ndim,)
            mean = xg.mean(axis=red, keepdims=True)
            var = jnp.mean(jnp.square(xg - mean), axis=red, keepdims=True)
            xg = (xg - mean) / jnp.sqrt(var + self.epsilon)
            return (xg.reshape(x.shape) * scale.astype(x.dtype)
                    + bias.astype(x.dtype))

    def crop_or_pad(x, hw):
        h, w = hw
        xh, xw = x.shape[1], x.shape[2]
        x = x[:, : min(h, xh), : min(w, xw), :]
        ph, pw = h - x.shape[1], w - x.shape[2]
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        return x

    class NearestUpConv(nn.Module):
        features: int
        kernel_size: int
        stride: int
        padding: int = 0
        use_bias: bool = True
        dtype: Optional[Any] = None

        @nn.compact
        def __call__(self, x):
            x = jnp.repeat(jnp.repeat(x, self.stride, axis=1), self.stride, axis=2)
            return B.tconv(self.features, 1, name="conv1x1", dtype=self.dtype)(x)

    # the round-4 restructurings live in a separate module namespace; an
    # affine stub for the s2d GroupNorm keeps the gn attribution meaningful
    # on the restructured (default) layout
    from midd_tpu.ops import unet_s2d as S

    class AffineGroupNormS2d(nn.Module):
        segments: Any = None
        epsilon: float = 1e-5

        @nn.compact
        def __call__(self, xs):
            c = xs.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            return xs * scale.astype(xs.dtype) + bias.astype(xs.dtype)

    VARIANTS = {
        "base": {},
        # the pre-round-4 layout (no stage-0 s2d, no FusedUpDown): what the
        # exact restructurings are worth on the CURRENT program
        "plain_layout": {"layout": False},
        "attn_xla": {"flash": False},
        "no_attn": {"attn": IdAttention},
        "no_resize": {"resize": crop_or_pad},
        "gn_affine": {"gn": AffineGroupNorm, "gn_s2d": AffineGroupNormS2d},
        "gn_lowp": {"gn": LowpGroupNorm},
        "no_upconv": {"upconv": NearestUpConv},
        "convs_only": {
            "attn": IdAttention,
            "resize": crop_or_pad,
            "gn": AffineGroupNorm,
            "gn_s2d": AffineGroupNormS2d,
            "upconv": NearestUpConv,
        },
    }

    saved = dict(
        attn_u=U.AttentionBlock, gn_u=U.GroupNorm32, gn_b=B.GroupNorm32,
        resize_u=U.resize_bilinear, upconv_u=U.ConvTransposeTorch,
        gn_s2d_u=U.GroupNorm32S2d, gn_s2d_s=S.GroupNorm32S2d,
    )

    def patched_model(spec):
        U.AttentionBlock = spec.get("attn", saved["attn_u"])
        U.GroupNorm32 = spec.get("gn", saved["gn_u"])
        B.GroupNorm32 = spec.get("gn", saved["gn_b"])
        U.GroupNorm32S2d = spec.get("gn_s2d", saved["gn_s2d_u"])
        S.GroupNorm32S2d = spec.get("gn_s2d", saved["gn_s2d_s"])
        U.resize_bilinear = spec.get("resize", saved["resize_u"])
        U.ConvTransposeTorch = spec.get("upconv", saved["upconv_u"])
        layout = spec.get("layout", True)
        return U.UNetDiffusion(
            config.SERVE_DIFFUSION, dtype=dtype,
            use_flash=spec.get("flash", on_tpu),
            s2d_stage0=layout, fuse_updown=layout,
        )

    def restore():
        U.AttentionBlock = saved["attn_u"]
        U.GroupNorm32 = saved["gn_u"]
        B.GroupNorm32 = saved["gn_b"]
        U.GroupNorm32S2d = saved["gn_s2d_u"]
        S.GroupNorm32S2d = saved["gn_s2d_s"]
        U.resize_bilinear = saved["resize_u"]
        U.ConvTransposeTorch = saved["upconv_u"]

    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.random((batch, size, size, 1)).astype(np.float32))
    if dtype is not None:
        cond = cond.astype(dtype)
    tt = jnp.full((batch,), 25, jnp.int32)
    x0 = jnp.asarray(rng.random((batch, size, size, 1)).astype(np.float32))
    if dtype is not None:
        x0 = x0.astype(dtype)

    if args.variants:
        keep = {"base"} | set(args.variants.split(","))
        VARIANTS = {k: v for k, v in VARIANTS.items() if k in keep}

    results = {}
    base_ms = None
    for name, spec in VARIANTS.items():
        model = patched_model(spec)
        try:
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(0),
                x0[:1].astype(jnp.float32), x0[:1].astype(jnp.float32), tt[:1],
            )

            # weights as runtime args (CLAUDE.md: closures -> HTTP 413 at scale)
            def scan_fwd(v, x):
                def step(c, _):
                    return model.apply(v, c, cond, tt), None
                return jax.lax.scan(step, x, None, length=N_SCAN)[0]

            fn = jax.jit(scan_fwd)
            t = time.time()
            float(jnp.sum(fn(variables, x0).astype(jnp.float32)))
            log(f"{name}: compile {time.time() - t:.1f}s")

            xs = [(x0 + jnp.asarray(i, x0.dtype)).astype(x0.dtype)
                  for i in range(1, N_TIMED + 1)]
            t = time.time()
            _ = sum(float(jnp.sum(fn(variables, x).astype(jnp.float32)))
                    for x in xs)
            ms = (time.time() - t) / (N_TIMED * N_SCAN) * 1e3
        finally:
            restore()
        if base_ms is None:
            base_ms = ms
        results[name] = round(ms, 3)
        log(f"{name}: {ms:7.3f} ms/fwd  (base-variant delta {base_ms - ms:+.3f} ms)")

    log("\nattribution (ms saved vs base when the component is removed):")
    for name, ms in results.items():
        if name != "base":
            log(f"  {name:12s} {results['base'] - ms:+7.3f} ms")

    out = {"device": str(dev), "batch": batch, "size": size,
           "ms_per_forward": results}
    with open("forward_attribution.json", "w") as f:
        json.dump(out, f, indent=1)
    log("wrote forward_attribution.json")


if __name__ == "__main__":
    main()
