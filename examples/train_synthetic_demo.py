"""End-to-end training demo: denoise synthetic speckled X-ray-like images.

Generates a structured synthetic corpus (soft-tissue gradients + bone-like
ellipses), corrupts it with multiplicative speckle (the reference's primary
noise type, README.md:15), trains a mid-size NAFNet, and reports PSNR/SSIM
before vs after. Runs on whatever device JAX selects (TPU by default).

    python examples/train_synthetic_demo.py [--epochs 15] [--size 128] [--width 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_phantoms(n: int, size: int, seed: int = 0) -> np.ndarray:
    """Synthetic 'X-ray' images: smooth illumination + ellipses + ribs."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = []
    for _ in range(n):
        img = 0.25 + 0.3 * (xx * rng.uniform(0.5, 1.5) + yy * rng.uniform(0.3, 1.2)) / 2
        for _ in range(rng.integers(2, 5)):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            ax, ay = rng.uniform(0.05, 0.3, 2)
            d = ((xx - cx) / ax) ** 2 + ((yy - cy) / ay) ** 2
            img = img + rng.uniform(0.15, 0.4) * np.exp(-d * 2.0)
        for k in range(rng.integers(3, 7)):  # rib-like bands
            phase = rng.uniform(0, np.pi)
            img = img + 0.06 * np.maximum(
                0, np.sin(yy * np.pi * rng.uniform(6, 12) + phase)
            ) * np.exp(-((xx - 0.5) ** 2) * 4)
        imgs.append(np.clip(img, 0, 1))
    return np.stack(imgs)[..., None].astype(np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from midd_tpu import config
    from midd_tpu.train import data
    from midd_tpu.train.metrics import compute_metrics
    from midd_tpu.train.recipes import train_nafnet
    from midd_tpu.train.trainer import TrainConfig

    clean = make_phantoms(args.n, args.size)
    dataset = data.SyntheticPairedDataset(
        clean,
        noise_type="speckle",
        is_train=True,
        augment=data.AugmentConfig(rotation_prob=0.0),  # keep geometry simple
    )

    # baseline: noisy-vs-clean quality
    val = data.SyntheticPairedDataset(clean[:8], noise_type="speckle", is_train=False, seed=999)
    noisy_stack = np.stack([val[i][1] for i in range(8)])
    base_p, base_s = compute_metrics(jnp.asarray(noisy_stack), jnp.asarray(clean[:8]))
    print(f"baseline (noisy) PSNR {float(base_p):.2f} dB SSIM {float(base_s):.4f}",
          file=sys.stderr, flush=True)

    model_cfg = config.NAFNetConfig(
        width=args.width, middle_blk_num=2, enc_blk_nums=(1, 1, 2), dec_blk_nums=(1, 1, 1)
    )
    train_cfg = TrainConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=1e-3,
        warmup_epochs=2,
        ckpt_dir="/tmp/demo_ckpt",
        ckpt_name="nafnet_demo",
    )
    state = train_nafnet(dataset, model_cfg=model_cfg, train_cfg=train_cfg)

    result = {
        "event": "train_synthetic_demo",
        "device": str(jax.devices()[0]),
        "baseline_psnr": round(float(base_p), 2),
        "best_psnr": round(state.best_psnr, 2),
        "best_ssim": round(state.best_ssim, 4),
        "psnr_gain_db": round(state.best_psnr - float(base_p), 2),
        "epochs": args.epochs,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
