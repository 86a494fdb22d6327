"""Diffusion train-step timing at 512²: flash-attention backward vs XLA.

VERDICT round-1 item 4's measurement half: the Pallas flash kernel now has a
custom_vjp (gradient-equivalence tested on CPU in tests/test_flash_attention);
this measures what it buys the TRAINER on real TPU at 512², where the
attention sequence is n = 64x64 = 4096 (vs 1024 at 256², where flash is worth
~3% end-to-end).

Timing rules (CLAUDE.md): 10 steps inside one lax.scan per measurement so
the ~30 ms tunnel round-trip amortizes; distinct dtype-preserving inputs per
repetition; forced materialisation.

Run: python examples/train_step_bench.py [--img-size 512] [--batch 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--inner", type=int, default=10, help="steps per scan")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the loss (trade FLOPs for HBM)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from midd_tpu import config
    from midd_tpu.models import UNetDiffusion
    from midd_tpu.diffusion import make_schedule
    from midd_tpu.train.trainer import diffusion_loss_fn
    from midd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    s = args.img_size
    schedule = make_schedule(config.SERVE_SCHEDULE)
    tx = optax.adam(2e-4)

    results = {}
    for label, use_flash in (("flash", True), ("xla", False)):
        model = UNetDiffusion(
            config.SERVE_DIFFUSION, dtype=jnp.bfloat16, use_flash=use_flash
        )
        x0 = jnp.zeros((args.batch, s, s, 1), jnp.float32)
        t0 = jnp.zeros((args.batch,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, x0, t0)["params"]
        opt_state = tx.init(params)

        loss_fn = diffusion_loss_fn(model, schedule)
        if args.remat:
            loss_fn = jax.checkpoint(loss_fn)

        def one_step(carry, xs):
            params, opt_state = carry
            clean, noisy, key = xs
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, (clean, noisy), key
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        @jax.jit
        def run(params, opt_state, clean, noisy, key):
            keys = jax.random.split(key, args.inner)
            (params, opt_state), losses = jax.lax.scan(
                one_step,
                (params, opt_state),
                (clean, noisy, keys),
            )
            return params, opt_state, losses

        rng = np.random.default_rng(0)

        def batch_stack(seed):
            r = np.random.default_rng(seed)
            clean = np.clip(
                r.random((args.inner, args.batch, s, s, 1)), 0, 1
            ).astype(np.float32)
            noisy = np.clip(clean + r.normal(0, 0.1, clean.shape), 0, 1).astype(
                np.float32
            )
            return jnp.asarray(clean), jnp.asarray(noisy)

        c, n = batch_stack(123)
        t = time.time()
        params, opt_state, losses = run(params, opt_state, c, n, jax.random.PRNGKey(1))
        float(jnp.sum(losses))
        print(f"{label}: compile+first {time.time() - t:.1f}s", file=sys.stderr)

        times = []
        for rep in range(args.reps):
            c, n = batch_stack(1000 + rep)
            t = time.time()
            params, opt_state, losses = run(
                params, opt_state, c, n, jax.random.PRNGKey(2 + rep)
            )
            float(jnp.sum(losses))
            times.append((time.time() - t) / args.inner)
        ms = float(np.median(times) * 1e3)
        results[label] = round(ms, 2)
        print(f"{label}: {ms:.1f} ms/step (b{args.batch} {s}²)", file=sys.stderr)

    results["speedup"] = round(results["xla"] / results["flash"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
