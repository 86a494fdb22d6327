"""Wide-channel diffusion variant study (ROADMAP lever 2, executed).

The ROADMAP scaling probe showed the 48-base UNet leaves roughly half the
MXU idle at channel widths 48-192 (channels x2 costs only 1.9x time for 4x
FLOPs). This study asks the quality-per-second question on ground truth:
train the reference-width (48) and a 96-base diffusion UNet with the SAME
recipe on the xraybench-v1 train split, score both on the fixed eval set,
and time both rollouts — does the wider model's quality gain justify its
sub-linear cost on TPU?

Run (TPU, ~20-40 min incl. compiles):
    python examples/wide_variant_study.py --out wide_study.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_rollout(model, variables, schedule, steps, batch, size):
    """Rollout throughput at serving batch, distinct inputs per timed call
    (CLAUDE.md timing rules)."""
    import jax
    import jax.numpy as jnp

    from midd_tpu.diffusion import denoise

    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(np.clip(rng.random((batch, size, size, 1)), 0, 1).astype(np.float32))
        for _ in range(4)
    ]

    @jax.jit
    def rollout(x):
        eps = lambda a, c, t: model.apply(variables, a, c, t)
        return denoise(eps, x, schedule, inference_steps=steps)

    float(jnp.sum(rollout(xs[-1])))  # compile + warm
    t = time.time()
    _ = sum(float(jnp.sum(rollout(x))) for x in xs[:3])
    dt = (time.time() - t) / 3
    return batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--n-train", type=int, default=96)
    ap.add_argument("--epochs-scale", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=8, help="eval rollout steps")
    ap.add_argument("--ckpt-dir", default="wide_ckpts")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from midd_tpu import config
    from midd_tpu.benchmarks.xray_bench import (
        make_eval_set, make_train_dataset, score_fn, format_table,
    )
    from midd_tpu.diffusion import denoise, make_schedule
    from midd_tpu.models import UNetDiffusion
    from midd_tpu.train import recipes
    from midd_tpu.train.trainer import TrainConfig
    from midd_tpu.utils.checkpoint import load_checkpoint
    from midd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    log(f"device: {jax.devices()[0]}")

    variants = {
        "w48": config.SERVE_DIFFUSION,  # reference width (DDIM/DDIMModel.py:168)
        "w96": config.WIDE_DIFFUSION,
    }
    ds = make_train_dataset(args.n_train, args.img_size)
    e = max(2, int(30 * args.epochs_scale))
    schedule = make_schedule(config.SERVE_SCHEDULE)
    eval_set = make_eval_set(8, args.img_size)
    use_flash = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if use_flash else None

    results = {}
    for tag, mcfg in variants.items():
        t0 = time.time()
        recipes.train_diffusion(
            ds, mcfg,
            train_cfg=TrainConfig(
                epochs=e, batch_size=2, lr=2e-4, weight_decay=1e-4,
                ckpt_name=f"diffusion_{tag}", ckpt_dir=args.ckpt_dir,
            ),
        )
        train_s = time.time() - t0
        tree, _meta = load_checkpoint(f"{args.ckpt_dir}/diffusion_{tag}")
        params = tree["params"] if "params" in tree else tree
        model = UNetDiffusion(mcfg, dtype=dtype, use_flash=use_flash)
        variables = {"params": params}
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

        def fwd(noisy):
            eps = lambda a, c, t: model.apply(variables, a, c, t)
            return jnp.clip(
                denoise(eps, noisy, schedule, inference_steps=args.steps), 0, 1
            )

        quality = score_fn(jax.jit(fwd), eval_set)
        ips = time_rollout(
            model, variables, schedule, args.steps, 8, args.img_size
        )
        results[tag] = {
            **quality,
            "img_per_s_b8": round(ips, 2),
            "params": int(n_params),
            "train_s": round(train_s, 1),
        }
        log(f"[{tag}] {n_params/1e6:.1f}M params, train {train_s:.0f}s, "
            f"PSNR {quality['overall']['psnr']:.2f} dB, {ips:.1f} img/s (b8, "
            f"{args.steps}-step)")

    print(format_table({k: v for k, v in results.items()}))
    w48, w96 = results["w48"], results["w96"]
    log(f"cost ratio {w48['img_per_s_b8']/w96['img_per_s_b8']:.2f}x slower for "
        f"{w96['params']/w48['params']:.1f}x params; quality delta "
        f"{w96['overall']['psnr'] - w48['overall']['psnr']:+.2f} dB")
    payload = {"study": "wide-variant", "img_size": args.img_size,
               "steps": args.steps, "results": results}
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
