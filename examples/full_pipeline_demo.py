"""The complete reference workflow, end to end, at demo scale:

  stage 1: train EnhancedNAFNet                (NafNet/NafnetModel.py trainer)
  stage 2: train the conditional diffusion UNet (DDIM/DDIMModel.py trainer)
  stage 3: train the hybrid router+fusion on the FROZEN stage-1/2 checkpoints
           (hybrid3diffusionspeed.py trainer)

on synthetic speckled X-ray phantoms, reporting PSNR/SSIM per stage, with
every stage running as jitted XLA programs on the selected device.

    python examples/full_pipeline_demo.py [--size 64] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from examples.train_synthetic_demo import make_phantoms


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ckpt-dir", default="/tmp/pipeline_demo")
    ap.add_argument("--hybrid-epochs", type=int, default=150)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from midd_tpu import config
    from midd_tpu.train import data
    from midd_tpu.train.metrics import compute_metrics
    from midd_tpu.train.recipes import train_diffusion, train_hybrid, train_nafnet
    from midd_tpu.train.trainer import TrainConfig

    clean = make_phantoms(args.n, args.size)
    dataset = data.SyntheticPairedDataset(
        clean, noise_type="speckle", is_train=True,
        augment=data.AugmentConfig(rotation_prob=0.0),
    )
    n_val = min(8, args.n)
    val = data.SyntheticPairedDataset(clean[:n_val], noise_type="speckle", is_train=False, seed=999)
    noisy_stack = np.stack([val[i][1] for i in range(n_val)])
    base_p, _ = compute_metrics(jnp.asarray(noisy_stack), jnp.asarray(clean[:n_val]))
    print(f"[baseline] noisy PSNR {float(base_p):.2f} dB", file=sys.stderr, flush=True)

    naf_cfg = config.NAFNetConfig(
        width=16, middle_blk_num=2, enc_blk_nums=(1, 1, 2), dec_blk_nums=(1, 1, 1)
    )
    unet_cfg = config.DiffusionUNetConfig(
        model_channels=16, channel_mult=(1, 2, 3), num_res_blocks=1,
        attention_resolutions=(2,), time_emb_dim=64,
    )
    sched_cfg = config.ScheduleConfig(noise_steps=50)

    print("[stage 1] training NAFNet...", file=sys.stderr, flush=True)
    st1 = train_nafnet(
        dataset,
        model_cfg=naf_cfg,
        train_cfg=TrainConfig(epochs=25, batch_size=8, lr=1e-3, warmup_epochs=2,
                              ckpt_dir=args.ckpt_dir, ckpt_name="nafnet"),
    )
    print(f"[stage 1] NAFNet best PSNR {st1.best_psnr:.2f} dB", file=sys.stderr, flush=True)

    print("[stage 2] training diffusion UNet...", file=sys.stderr, flush=True)
    st2 = train_diffusion(
        dataset,
        model_cfg=unet_cfg,
        schedule_cfg=sched_cfg,
        train_cfg=TrainConfig(epochs=60, batch_size=8, lr=1e-3,
                              ckpt_dir=args.ckpt_dir, ckpt_name="diffusion"),
        val_inference_steps=15,
    )
    print(f"[stage 2] diffusion best PSNR {st2.best_psnr:.2f} dB", file=sys.stderr, flush=True)

    print("[stage 3] training hybrid router+fusion on frozen backends...",
          file=sys.stderr, flush=True)
    hybrid_cfg = config.HybridConfig(
        nafnet=naf_cfg,
        diffusion=unet_cfg,
        schedule=sched_cfg,
        router=config.RouterConfig(base_c=16),
        fusion=config.FusionConfig(base_c=16),
        training_diffusion_steps=8,
        inference_diffusion_steps=8,
    )
    st3 = train_hybrid(
        dataset,
        nafnet_ckpt=os.path.join(args.ckpt_dir, "nafnet"),
        diffusion_ckpt=os.path.join(args.ckpt_dir, "diffusion"),
        hybrid_cfg=hybrid_cfg,
        train_cfg=TrainConfig(epochs=args.hybrid_epochs, batch_size=8, lr=1e-3,
                              patience=50, ckpt_dir=args.ckpt_dir,
                              ckpt_name="hybrid"),
    )
    print(f"[stage 3] hybrid best PSNR {st3.best_psnr:.2f} dB", file=sys.stderr, flush=True)

    print(json.dumps({
        "event": "full_pipeline_demo",
        "device": str(jax.devices()[0]),
        "baseline_psnr": round(float(base_p), 2),
        "nafnet_psnr": round(st1.best_psnr, 2),
        "diffusion_psnr": round(st2.best_psnr, 2),
        "hybrid_psnr": round(st3.best_psnr, 2),
        "hybrid_ssim": round(st3.best_ssim, 4),
    }))


if __name__ == "__main__":
    main()
