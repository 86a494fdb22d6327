"""Measure LayerNorm2d's share of the NAFNet forward (TPU, scan-20 harness).

Companion to examples/forward_attribution.py for the hybrid's other half:
times the serving NAFNet forward (b8 512^2 by default, bf16 on TPU) with the
real LayerNorm2d vs an affine-only stub, to decide whether the one-pass
E[x^2]-mean^2 variance rewrite that moved the diffusion bench 7.96->10.11
img/s also pays here (the NAF norm reduces over the minor/lane axis, which
XLA may already fuse into a single pass — measure, don't assume).
"""

from __future__ import annotations

import json
import sys
import time
from typing import Optional, Any

import numpy as np

N_SCAN = 20
N_TIMED = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from midd_tpu import config
    from midd_tpu.models import blocks as B
    from midd_tpu.models import nafnet as N
    from midd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else None
    log(f"device: {dev}")

    class AffineLN(nn.Module):
        epsilon: float = 1e-6

        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            return x * scale.astype(x.dtype) + bias.astype(x.dtype)

    class Bf16LN(nn.Module):
        """Stats and normalize in the input dtype (isolates the fp32 cost)."""

        epsilon: float = 1e-6

        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            u = x.mean(axis=-1, keepdims=True)
            s = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(u)
            out = (x - u) * jax.lax.rsqrt(s + jnp.asarray(self.epsilon, x.dtype))
            return out * scale.astype(x.dtype) + bias.astype(x.dtype)

    class CenteredLN(nn.Module):
        """The round-2 two-pass centered-variance form (regression anchor)."""

        epsilon: float = 1e-6

        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            xf = x.astype(jnp.float32)
            u = xf.mean(axis=-1, keepdims=True)
            s = jnp.mean(jnp.square(xf - u), axis=-1, keepdims=True)
            out = (xf - u) / jnp.sqrt(s + self.epsilon) * scale + bias
            return out.astype(x.dtype)

    saved = B.LayerNorm2d
    variants = {
        "base": saved,
        "ln_centered": CenteredLN,
        "ln_bf16": Bf16LN,
        "ln_affine": AffineLN,
    }

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.random((args.batch, args.size, args.size, 1)).astype(np.float32)
    )
    if dtype is not None:
        x0 = x0.astype(dtype)

    results = {}
    for name, ln in variants.items():
        B.LayerNorm2d = ln  # NAFBlock resolves it from blocks' module globals
        try:
            model = N.EnhancedNAFNet(config.SERVE_NAFNET, dtype=dtype)
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(0), x0[:1].astype(jnp.float32)
            )

            def scan_fwd(v, x):
                def step(c, _):
                    return model.apply(v, c).astype(x.dtype), None

                return jax.lax.scan(step, x, None, length=N_SCAN)[0]

            fn = jax.jit(scan_fwd)
            t = time.time()
            float(jnp.sum(fn(variables, x0).astype(jnp.float32)))
            log(f"{name}: compile {time.time() - t:.1f}s")
            xs = [
                (x0 + jnp.asarray(i * 1e-3, x0.dtype)).astype(x0.dtype)
                for i in range(1, N_TIMED + 1)
            ]
            t = time.time()
            _ = sum(
                float(jnp.sum(fn(variables, x).astype(jnp.float32))) for x in xs
            )
            ms = (time.time() - t) / (N_TIMED * N_SCAN) * 1e3
        finally:
            B.LayerNorm2d = saved
        results[name] = round(ms, 3)
        log(f"{name}: {ms:8.3f} ms/fwd")

    out = {
        "device": str(dev),
        "batch": args.batch,
        "size": args.size,
        "ms_per_forward": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
