"""Random-feature perceptual-loss proxy validation (VERDICT round-1 item 9).

The Expert trainer's VGG19 perceptual term (reference:
DirectUNet/DirectUNetModel.py:143-158, weight 0.3 in :257-268) is replaced in
this repo by a fixed seeded random-conv feature pyramid
(midd_tpu/train/losses.py::feature_loss) because pretrained weights cannot be
downloaded offline. This experiment tests whether that stand-in actually
helps: train the Expert on the xraybench-v1 protocol (a) with the
random-feature term at the reference weight, (b) without any perceptual term,
then score both on the fixed eval set.

    python examples/perceptual_ablation.py [--img-size 128] [--epochs 30]
                                           [--width 32] [--n-train 64]

Prints one JSON line with both arms' PSNR/SSIM; the adoption decision is
recorded in PARITY.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-size", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--width", type=int, default=32, help="Expert base_channels")
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--n-eval", type=int, default=8, help="images per noise type")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from midd_tpu import config
    from midd_tpu.benchmarks.xray_bench import (
        PROTOCOL_VERSION,
        make_eval_set,
        make_train_dataset,
        score_fn,
    )
    from midd_tpu.models import ExpertDenoiser
    from midd_tpu.train import recipes
    from midd_tpu.train.trainer import TrainConfig
    from midd_tpu.utils.checkpoint import load_checkpoint

    ds = make_train_dataset(args.n_train, args.img_size)
    eval_set = make_eval_set(args.n_eval, args.img_size)
    exp_cfg = config.ExpertConfig(base_channels=args.width)

    results = {}
    for arm, w in (("with_perceptual", 0.3), ("no_perceptual", 0.0)):
        with tempfile.TemporaryDirectory() as ckpt_dir:
            recipes.train_expert(
                ds,
                exp_cfg,
                TrainConfig(
                    epochs=args.epochs, batch_size=4, lr=1e-4, weight_decay=1e-5,
                    warmup_epochs=min(5, args.epochs // 4),
                    ckpt_dir=ckpt_dir, ckpt_name="expert", seed=args.seed,
                ),
                perceptual_weight=w,
            )
            tree, _meta = load_checkpoint(f"{ckpt_dir}/expert")
            model = ExpertDenoiser(exp_cfg)
            variables = {"params": tree["params"]}
            bs = tree.get("extra", {}).get("batch_stats") or tree.get("batch_stats")
            if bs:
                variables["batch_stats"] = bs
            fn = jax.jit(
                lambda x: jnp.clip(model.apply(variables, x), 0.0, 1.0)
            )
            results[arm] = score_fn(fn, eval_set)
            print(f"{arm}: {results[arm]['overall']}")

    delta = (
        results["with_perceptual"]["overall"]["psnr"]
        - results["no_perceptual"]["overall"]["psnr"]
    )
    print(
        json.dumps(
            {
                "experiment": "perceptual_ablation",
                "protocol": PROTOCOL_VERSION,
                "img_size": args.img_size,
                "epochs": args.epochs,
                "width": args.width,
                "seed": args.seed,
                "with_perceptual": results["with_perceptual"]["overall"],
                "no_perceptual": results["no_perceptual"]["overall"],
                "psnr_delta_with_minus_without": round(delta, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
