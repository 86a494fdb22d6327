"""Attribute the TRAIN STEP's time (fwd + bwd + AdamW) to components — the
backward analogue of examples/forward_attribution.py (round-4 verdict item:
training is the slowest thing in the repo, 13% / ~2% model MFU, and no
harness existed to say WHERE the backward wastes).

Method: the real jitted train step (value_and_grad + global-norm clip +
AdamW, scan-amortized like bench_train.py), recompiled with one component
class stubbed at a time. The base-minus-variant delta attributes that
component's fwd+bwd cost. Structural variants:

  fwd_only       loss forward only (no grad, no update) — splits fwd vs bwd
  no_update      value_and_grad but no optimizer        — isolates AdamW+clip
  plain_layout   (diffusion) s2d_stage0=False, fuse_updown=False — what the
                 round-4 exact restructurings are worth in TRAINING
  s2d            (nafnet) s2d_stage0=True — the new train_nafnet lever
  remat          jax.checkpoint around the loss

Component stubs (semantics deliberately broken; timing only):
  no_attn / gn_affine / no_resize / no_upconv   (diffusion, as fwd harness)
  no_dw / no_sca / ln_affine                    (nafnet)

Writes train_step_attribution.json. Reference trainers being attributed:
DDIM/DDIMModel.py:302-468, NafNet/NafnetModel.py:405-624.
Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python -u \
    examples/train_step_attribution.py
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Optional

import numpy as np

N_SCAN = 8
N_TIMED = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("diffusion", "nafnet", "both"),
                    default="both")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json-out", default="train_step_attribution.json")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from midd_tpu import config
    from midd_tpu.diffusion import make_schedule
    from midd_tpu.models import blocks as B
    from midd_tpu.models import nafnet as N
    from midd_tpu.models import unet_diffusion as U
    from midd_tpu.train.trainer import (
        TrainConfig,
        diffusion_loss_fn,
        make_optimizer,
        nafnet_loss_fn,
    )
    from midd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else None
    log(f"device: {dev}, bf16={dtype is not None}")
    batch, size = args.batch, args.size

    # ---- stubs (same set as forward_attribution) -------------------------
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

    class AffineLayerNorm2d(nn.Module):
        epsilon: float = 1e-6

        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            w = self.param("weight", nn.initializers.ones, (c,))
            b = self.param("bias", nn.initializers.zeros, (c,))
            return x * w.astype(x.dtype) + b.astype(x.dtype)

    def crop_or_pad(x, hw):
        h, w = hw
        x = x[:, : min(h, x.shape[1]), : min(w, x.shape[2]), :]
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

    saved = dict(
        attn_u=U.AttentionBlock, gn_u=U.GroupNorm32, gn_b=B.GroupNorm32,
        resize_u=U.resize_bilinear, upconv_u=U.ConvTransposeTorch,
        ln_b=B.LayerNorm2d, nafblock=B.NAFBlock, nafblock_n=N.NAFBlock,
    )

    def restore():
        U.AttentionBlock = saved["attn_u"]
        U.GroupNorm32 = saved["gn_u"]
        B.GroupNorm32 = saved["gn_b"]
        U.resize_bilinear = saved["resize_u"]
        U.ConvTransposeTorch = saved["upconv_u"]
        B.LayerNorm2d = saved["ln_b"]
        B.NAFBlock = saved["nafblock"]
        N.NAFBlock = saved["nafblock_n"]

    # ---- step factory -----------------------------------------------------
    def build_step(model_kind, spec):
        """(run, init, mode) for a full train step with ``spec`` patches."""
        mode = spec.get("mode", "train")  # train | fwd_only | no_update
        if model_kind == "diffusion":
            U.AttentionBlock = spec.get("attn", saved["attn_u"])
            U.GroupNorm32 = spec.get("gn", saved["gn_u"])
            B.GroupNorm32 = spec.get("gn", saved["gn_b"])
            U.resize_bilinear = spec.get("resize", saved["resize_u"])
            U.ConvTransposeTorch = spec.get("upconv", saved["upconv_u"])
            model = U.UNetDiffusion(
                config.SERVE_DIFFUSION, dtype=dtype, use_flash=on_tpu,
                s2d_stage0=spec.get("s2d", True),
                fuse_updown=spec.get("fuse", True),
            )
            schedule = make_schedule(config.SERVE_SCHEDULE)
            loss_fn = diffusion_loss_fn(model, schedule)

            def init(key):
                x0 = jnp.zeros((1, size, size, 1), jnp.float32)
                t0 = jnp.zeros((1,), jnp.int32)
                return jax.jit(model.init)(key, x0, x0, t0)["params"]
        else:
            if "ln" in spec:
                B.LayerNorm2d = spec["ln"]
            model = N.EnhancedNAFNet(
                config.SERVE_NAFNET, dtype=dtype,
                s2d_stage0=spec.get("s2d", False),
            )
            loss_fn = nafnet_loss_fn(model)

            def init(key):
                return jax.jit(model.init)(
                    key, jnp.zeros((1, size, size, 1), jnp.float32)
                )["params"]

        if spec.get("remat"):
            loss_fn = jax.checkpoint(loss_fn)
        tx = make_optimizer(TrainConfig(lr=2e-4, weight_decay=1e-4))

        def one_step(carry, xs):
            params, opt_state = carry
            clean, noisy, key = xs
            if mode == "fwd_only":
                loss, _ = loss_fn(params, (clean, noisy), key)
                return (params, opt_state), loss
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, (clean, noisy), key
            )
            if mode == "no_update":
                # consume the grads so XLA can't DCE the backward
                gsum = sum(
                    jnp.sum(g.astype(jnp.float32))
                    for g in jax.tree_util.tree_leaves(grads)
                )
                return (params, opt_state), loss + 0.0 * gsum.astype(loss.dtype)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        @jax.jit
        def run(params, opt_state, clean, noisy, key):
            keys = jax.random.split(key, clean.shape[0])
            (params, opt_state), losses = jax.lax.scan(
                one_step, (params, opt_state), (clean, noisy, keys)
            )
            return params, opt_state, losses

        return run, init, tx

    VARIANTS = {
        "diffusion": [
            ("base", {}),
            ("fwd_only", {"mode": "fwd_only"}),
            ("no_update", {"mode": "no_update"}),
            ("plain_layout", {"s2d": False, "fuse": False}),
            ("remat", {"remat": True}),
            ("no_attn", {"attn": IdAttention}),
            ("gn_affine", {"gn": AffineGroupNorm}),
            ("no_resize", {"resize": crop_or_pad}),
            ("no_upconv", {"upconv": NearestUpConv}),
            ("convs_only", {"attn": IdAttention, "resize": crop_or_pad,
                            "gn": AffineGroupNorm, "upconv": NearestUpConv}),
        ],
        "nafnet": [
            ("base", {}),
            ("fwd_only", {"mode": "fwd_only"}),
            ("no_update", {"mode": "no_update"}),
            ("s2d", {"s2d": True}),
            ("remat", {"remat": True}),
            ("ln_affine", {"ln": AffineLayerNorm2d}),
        ],
    }

    kinds = ("diffusion", "nafnet") if args.model == "both" else (args.model,)
    rng = np.random.default_rng(0)
    out = {"device": str(dev), "batch": batch, "size": size,
           "n_scan": N_SCAN, "ms_per_step": {}}
    for kind in kinds:
        results = {}
        for name, spec in VARIANTS[kind]:
            try:
                run, init, tx = build_step(kind, spec)
                params = init(jax.random.PRNGKey(0))
                opt_state = tx.init(params)

                def stack(seed):
                    r = np.random.default_rng(seed)
                    c = np.clip(r.random((N_SCAN, batch, size, size, 1)), 0, 1
                                ).astype(np.float32)
                    n = np.clip(c + r.normal(0, 0.1, c.shape), 0, 1
                                ).astype(np.float32)
                    return jnp.asarray(c), jnp.asarray(n)

                c, n = stack(1)
                t = time.time()
                params, opt_state, losses = run(
                    params, opt_state, c, n, jax.random.PRNGKey(1)
                )
                float(jnp.sum(losses))
                log(f"[{kind}] {name}: compile {time.time() - t:.1f}s")
                best = float("inf")
                for rep in range(N_TIMED):
                    c, n = stack(100 + rep)
                    t = time.time()
                    params, opt_state, losses = run(
                        params, opt_state, c, n, jax.random.PRNGKey(2 + rep)
                    )
                    float(jnp.sum(losses))
                    best = min(best, (time.time() - t) / N_SCAN)
            finally:
                restore()
            results[name] = round(best * 1e3, 2)
            base = results.get("base", results[name])
            log(f"[{kind}] {name}: {results[name]:8.2f} ms/step "
                f"(delta vs base {base - results[name]:+.2f})")
        out["ms_per_step"][kind] = results
        log(f"\n[{kind}] attribution (ms saved when the piece is removed):")
        for name, ms in results.items():
            if name != "base":
                log(f"  {name:14s} {results['base'] - ms:+8.2f} ms")

    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
