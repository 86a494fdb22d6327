"""Hybrid ablation study: make the flagship composition beat its own fast
path, or map its ceiling (round-2 verdict item 1 + 2).

Round-2 ground truth (PARITY.md, xraybench-v1): the reference-architecture
hybrid scores 44.84 dB overall vs 45.42 for the plain NAFNet it contains —
the router + fusion + 8-step rollout add ~60% compute for −0.58 dB. Two
confounds and one architectural hypothesis are separated here on a 2x2 grid
(all trained on the protocol train split with the reference recipe, scored
on the fixed eval set THROUGH THE REAL SERVING ENGINE):

  axis 1 — fusion head: reference synthesis head ("plain") vs the TPU-native
           residual head (FusionConfig.residual=True: zero-init correction
           on the NAFNet branch; starts at NAFNet quality by construction);
  axis 2 — diffusion backend: reference width w48 vs the TPU-optimal w96
           (wide_study.json: +3.67 dB standalone at 8 steps).

All four cells train the fusion at the SERVED step count (8) — the round-2
baseline trained at 10 and served at 8 (HybridConfig defaults vs run.py:72),
a third confound the grid removes.

Usage:
    python examples/hybrid_ablation.py [--epochs-scale 1.0] [--force]
Outputs hybrid_ablation.json + a printed table.
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench_ckpts")
WIDE = os.path.join(REPO, "wide_ckpts")
OUT_DIR = os.path.join(REPO, "ablation_ckpts")

VARIANTS = {
    # name: (residual fusion?, w96 backend?, fusion sees expert?)
    "plain_w48": (False, False, False),
    "residual_w48": (True, False, False),
    "plain_w96": (False, True, False),
    "residual_w96": (True, True, False),
    # third frozen branch: NAFNet/Expert errors correlate only ~0.56, so a
    # FIXED 0.8/0.2 blend already scores +0.25 dB over NAFNet alone on this
    # eval set (measured oracle, round 3) — the fusion should recover at
    # least that much
    "resid_exp_w48": (True, False, True),
    "resid_exp_w96": (True, True, True),
}

# loss ablation: the reference loss's L1 terms emit sign-gradients ~80x the
# MSE term's at 45 dB error levels, drowning the blend signal the head must
# learn; these cells train with the PSNR-aligned pure-MSE option
LOSS_VARIANTS = {
    "resid_l2_w48": (True, False, False, "l2"),
    "resid_exp_l2_w48": (True, False, True, "l2"),
    # round-3 follow-up: "width is not the constraint" was established under
    # the REFERENCE loss (resid_exp_w48 == resid_exp_w96 at 45.48); this cell
    # retests it under the adopted l2 loss, where the head can actually use
    # whatever extra signal the wide backend provides
    "resid_exp_l2_w96": (True, True, True, "l2"),
}


def _link(src: str, dst: str) -> None:
    if not os.path.islink(dst) and not os.path.exists(dst):
        os.symlink(src, dst)


def variant_dir(name: str, wide: bool) -> str:
    """Per-variant serving dir: standalone backends symlinked so the engine's
    trainer-checkpoint fallback resolves to the RIGHT diffusion width."""
    d = os.path.join(OUT_DIR, name)
    os.makedirs(d, exist_ok=True)
    _link(os.path.join(BENCH, "nafnet"), os.path.join(d, "nafnet"))
    _link(os.path.join(BENCH, "expert"), os.path.join(d, "expert"))
    _link(
        os.path.join(WIDE, "diffusion_w96") if wide
        else os.path.join(BENCH, "diffusion"),
        os.path.join(d, "diffusion"),
    )
    return d


def train_variant(name: str, residual: bool, wide: bool, sees_expert: bool,
                  epochs_scale: float, loss_variant: str = "reference"):
    from midd_tpu import config
    from midd_tpu.benchmarks.xray_bench import make_train_dataset
    from midd_tpu.train import recipes
    from midd_tpu.train.trainer import TrainConfig

    d = variant_dir(name, wide)
    hyb_cfg = config.HybridConfig(
        nafnet=config.SERVE_NAFNET,
        diffusion=config.WIDE_DIFFUSION if wide else config.SERVE_DIFFUSION,
        fusion=config.FusionConfig(residual=residual, sees_expert=sees_expert),
        training_diffusion_steps=8,   # run.py:72-73 serve step count
        inference_diffusion_steps=8,
    )
    ds = make_train_dataset(96, 256)
    e = max(2, int(50 * epochs_scale))
    t = time.time()
    recipes.train_hybrid(
        ds,
        nafnet_ckpt=os.path.join(d, "nafnet"),
        diffusion_ckpt=os.path.join(d, "diffusion"),
        expert_ckpt=os.path.join(d, "expert") if sees_expert else None,
        hybrid_cfg=hyb_cfg,
        train_cfg=TrainConfig(
            epochs=e, batch_size=4, lr=4e-4, weight_decay=1e-4,
            eta_min_factor=0.02, patience=20, ckpt_name="hybrid", ckpt_dir=d,
        ),
        loss_variant=loss_variant,
    )
    print(f"[{name}] trained in {time.time() - t:.0f}s")


def score_variant(name: str, eval_set, eps_reuse: int = 1):
    """Score through the real serving path (engine, exact rollout)."""
    from midd_tpu.benchmarks.xray_bench import score_fn
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    d = os.path.join(OUT_DIR, name)
    eng = InferenceEngine(EngineConfig(
        img_size=256, diffusion_steps=8, hybrid_diffusion_steps=8,
        ckpt_dir=d, warmup=False,
        turbo_eps_reuse=1, hybrid_turbo_eps_reuse=eps_reuse,
    ))
    return score_fn(eng.fns["hybrid"], eval_set)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs-scale", type=float, default=1.0)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--only", default=None,
                    help="train/score just this variant and merge it into an "
                         "existing --json-out (skips anchors + other cells)")
    ap.add_argument("--json-out", default=os.path.join(REPO, "hybrid_ablation.json"))
    args = ap.parse_args()

    from midd_tpu.benchmarks.xray_bench import make_eval_set, score_fn
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    eval_set = make_eval_set(8, 256)
    results = {}
    if args.only and os.path.exists(args.json_out):
        with open(args.json_out) as f:
            results = json.load(f)["results"]

    if not args.only:
        # anchors: plain NAFNet (the bar) and the round-2 hybrid checkpoint
        eng0 = InferenceEngine(EngineConfig(
            img_size=256, diffusion_steps=8, hybrid_diffusion_steps=8,
            ckpt_dir=BENCH, warmup=False, turbo_eps_reuse=1,
            hybrid_turbo_eps_reuse=1,
        ))
        results["nafnet"] = score_fn(eng0.fns["nafnet"], eval_set)
        results["hybrid_round2"] = score_fn(eng0.fns["hybrid"], eval_set)
        del eng0

    all_variants = {
        **{k: (*v, "reference") for k, v in VARIANTS.items()},
        **LOSS_VARIANTS,
    }
    if args.only:
        all_variants = {args.only: all_variants[args.only]}
    for name, (residual, wide, sees_expert, lv) in all_variants.items():
        ck = os.path.join(OUT_DIR, name, "hybrid")
        if args.force or not os.path.isdir(ck):
            train_variant(name, residual, wide, sees_expert,
                          args.epochs_scale, loss_variant=lv)
        results[name] = score_variant(name, eval_set)
        print(f"[{name}] overall {results[name]['overall']['psnr']:.2f} dB "
              f"/ {results[name]['overall']['ssim']:.4f}")

    hdr = f"{'variant':<16}{'overall PSNR':>14}{'SSIM':>9}{'vs nafnet':>11}"
    print(hdr)
    print("-" * len(hdr))
    bar = results["nafnet"]["overall"]["psnr"]
    for name, r in results.items():
        o = r["overall"]
        print(f"{name:<16}{o['psnr']:>14.2f}{o['ssim']:>9.4f}"
              f"{o['psnr'] - bar:>+11.2f}")

    with open(args.json_out, "w") as f:
        json.dump({"protocol": "xraybench-v1", "results": results}, f, indent=1)
    print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
