"""Level the bar: give NAFNet and the Expert the PSNR-aligned l2 loss lever
the hybrid flagship won with, then re-adjudicate the flagship claim on equal
footing (round-3 verdict item 1).

Round-3 state: the adopted flagship (residual expert-fed fusion + l2 loss)
scores 46.32/46.22 dB on xraybench-v1 vs 45.42/45.47 for plain NAFNet — but
the hybrid cell got `loss_variant="l2"` while NAFNet trained with the
reference CombinedLoss (1*MSE + 0.5*L1 + 0.3*Freq + 0.2*Edge,
/root/reference/Backend/NafNet/NafnetModel.py:349-386) and the Expert with
the L1-led HybridLoss (DirectUNet/DirectUNetModel.py:257-268). The ablation's
own mechanism — L1 sign-gradients drown PSNR-seeking corrections ~80:1 at
45 dB — applies equally to the backends, so the +0.90 dB headline compared an
l2-tuned hybrid against an L1-handicapped baseline.

This study trains, on the SAME protocol train split with the SAME recipes:
  - nafnet_l2:  SERVE_NAFNET from scratch, loss_variant="l2"
  - expert_l2:  SERVE_EXPERT from scratch, loss_variant="l2"
  - hybrid_l2bar: the adopted flagship profile (residual + sees_expert + l2,
    8-step rollout) retrained on the FROZEN l2 backends (the fusion's
    residual head sees whatever NAFNet it is given)
and rescores the round-3 anchors (bench_ckpts nafnet/expert/hybrid) through
the identical engine path, so every row of the output table had access to
the same loss lever.

Adjudication rule (stated up front): the flagship claim survives only if the
best hybrid cell beats the best SINGLE model; otherwise NAFNet-l2 is adopted
as the quality flagship and the hybrid's premise is re-scoped.

Usage (TPU, ~45-60 min):
    PYTHONPATH=/root/repo:/root/.axon_site python -u examples/l2_bar_study.py
Outputs l2_bar_study.json + a printed table.
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench_ckpts")
OUT_DIR = os.path.join(REPO, "ablation_ckpts")


def _link(src: str, dst: str) -> None:
    if not os.path.islink(dst) and not os.path.exists(dst):
        os.symlink(src, dst)


def train_backend_l2(kind: str, d: str, epochs_scale: float) -> None:
    """From-scratch l2 cell with the reference recipe's optimizer/schedule
    (the ONLY difference vs the bench_ckpts cell is the objective)."""
    from midd_tpu import config
    from midd_tpu.benchmarks.xray_bench import make_train_dataset
    from midd_tpu.train import recipes
    from midd_tpu.train.trainer import TrainConfig

    ds = make_train_dataset(96, 256)
    e = lambda n: max(2, int(n * epochs_scale))
    t = time.time()
    if kind == "nafnet":
        recipes.train_nafnet(
            ds, config.SERVE_NAFNET,
            TrainConfig(epochs=e(50), batch_size=2, lr=2e-4, weight_decay=1e-4,
                        warmup_epochs=5, ckpt_name="nafnet", ckpt_dir=d),
            loss_variant="l2",
        )
    else:
        recipes.train_expert(
            ds, config.SERVE_EXPERT,
            TrainConfig(epochs=e(70), batch_size=4, lr=1e-4, weight_decay=1e-5,
                        warmup_epochs=5, ckpt_name="expert", ckpt_dir=d),
            loss_variant="l2",
        )
    print(f"[{kind}_l2] trained in {time.time() - t:.0f}s", flush=True)


def train_nafnet_ftl2(d: str, epochs_scale: float) -> None:
    """The decisive cell: l2 FINE-TUNE of the reference-loss NAFNet (init
    from the bench checkpoint, fresh low-lr cosine). From-scratch l2 trains
    WORSE (the composite loss is the better from-scratch trainer); the
    regime where l2 demonstrably wins is polishing an already-converged
    model — exactly what the hybrid's head does. If this cell clears the
    flagship, the premise is re-falsified."""
    from midd_tpu import config
    from midd_tpu.benchmarks.xray_bench import make_train_dataset
    from midd_tpu.train import recipes
    from midd_tpu.train.trainer import TrainConfig

    ds = make_train_dataset(96, 256)
    t = time.time()
    recipes.train_nafnet(
        ds, config.SERVE_NAFNET,
        TrainConfig(epochs=max(2, int(20 * epochs_scale)), batch_size=2,
                    lr=5e-5, weight_decay=1e-4, warmup_epochs=0,
                    eta_min_factor=0.02, ckpt_name="nafnet", ckpt_dir=d),
        loss_variant="l2",
        init_from=os.path.join(BENCH, "nafnet"),
    )
    print(f"[nafnet_ftl2] trained in {time.time() - t:.0f}s", flush=True)


def train_hybrid_on(d: str, epochs_scale: float) -> None:
    """The adopted flagship profile, frozen backends taken from dir ``d``
    (nafnet/expert symlinks point at the l2 cells)."""
    from midd_tpu import config
    from midd_tpu.benchmarks.xray_bench import make_train_dataset
    from midd_tpu.train import recipes
    from midd_tpu.train.trainer import TrainConfig

    hyb_cfg = config.HybridConfig(
        nafnet=config.SERVE_NAFNET,
        diffusion=config.SERVE_DIFFUSION,
        expert=config.SERVE_EXPERT,
        fusion=config.FusionConfig(residual=True, sees_expert=True),
        training_diffusion_steps=8,
        inference_diffusion_steps=8,
    )
    ds = make_train_dataset(96, 256)
    t = time.time()
    recipes.train_hybrid(
        ds,
        nafnet_ckpt=os.path.join(d, "nafnet"),
        diffusion_ckpt=os.path.join(d, "diffusion"),
        expert_ckpt=os.path.join(d, "expert"),
        hybrid_cfg=hyb_cfg,
        train_cfg=TrainConfig(
            epochs=max(2, int(50 * epochs_scale)), batch_size=4, lr=4e-4,
            weight_decay=1e-4, eta_min_factor=0.02, patience=20,
            ckpt_name="hybrid", ckpt_dir=d,
        ),
        loss_variant="l2",
    )
    print(f"[hybrid_l2bar] trained in {time.time() - t:.0f}s", flush=True)


def score_dir(ckpt_dir: str, paths, eval_set):
    """Score engine paths from one checkpoint dir, reference-exact numerics
    (eps=1 both rollouts, fp32 UNet evals) — identical settings for every
    row so the table is internally consistent."""
    from midd_tpu.benchmarks.xray_bench import score_fn
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    eng = InferenceEngine(EngineConfig(
        img_size=256, diffusion_steps=8, hybrid_diffusion_steps=8,
        ckpt_dir=ckpt_dir, warmup=False,
        turbo_eps_reuse=1, hybrid_turbo_eps_reuse=1,
        diffusion_eval_bf16=False, hybrid_rollout_bf16=False,
    ))
    out = {}
    for p in paths:
        out[p] = score_fn(eng.fns[p], eval_set)
    del eng
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs-scale", type=float, default=1.0)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--json-out", default=os.path.join(REPO, "l2_bar_study.json"))
    args = ap.parse_args()

    from midd_tpu.benchmarks.xray_bench import make_eval_set

    eval_set = make_eval_set(8, 256)
    results = {}

    # --- anchors: the round-3 cells, rescored through the identical path ---
    t = time.time()
    anchors = score_dir(BENCH, ("nafnet", "expert", "hybrid"), eval_set)
    results["nafnet_ref_loss"] = anchors["nafnet"]
    results["expert_ref_loss"] = anchors["expert"]
    results["hybrid_flagship_r3"] = anchors["hybrid"]
    print(f"[anchors] scored in {time.time() - t:.0f}s", flush=True)
    for k in ("nafnet_ref_loss", "expert_ref_loss", "hybrid_flagship_r3"):
        o = results[k]["overall"]
        print(f"  {k}: {o['psnr']:.2f} dB / {o['ssim']:.4f}", flush=True)

    # --- the l2 backends ---
    d_naf = os.path.join(OUT_DIR, "nafnet_l2")
    d_exp = os.path.join(OUT_DIR, "expert_l2")
    os.makedirs(d_naf, exist_ok=True)
    os.makedirs(d_exp, exist_ok=True)
    if args.force or not os.path.isdir(os.path.join(d_naf, "nafnet")):
        train_backend_l2("nafnet", d_naf, args.epochs_scale)
    if args.force or not os.path.isdir(os.path.join(d_exp, "expert")):
        train_backend_l2("expert", d_exp, args.epochs_scale)
    results["nafnet_l2"] = score_dir(d_naf, ("nafnet",), eval_set)["nafnet"]
    results["expert_l2"] = score_dir(d_exp, ("expert",), eval_set)["expert"]
    for k in ("nafnet_l2", "expert_l2"):
        o = results[k]["overall"]
        print(f"  {k}: {o['psnr']:.2f} dB / {o['ssim']:.4f}", flush=True)

    # --- optional cell: the flagship profile on the (weaker) scratch-l2
    # backends, kept if an earlier pass trained it — documents the
    # hybrid's sensitivity to backend quality ---
    d_scr = os.path.join(OUT_DIR, "hybrid_on_l2scratch")
    if os.path.isdir(os.path.join(d_scr, "hybrid")):
        results["hybrid_on_l2scratch"] = (
            score_dir(d_scr, ("hybrid",), eval_set)["hybrid"]
        )

    # --- the decisive cell: l2 fine-tune of the reference-loss NAFNet ---
    d_ft = os.path.join(OUT_DIR, "nafnet_ftl2")
    os.makedirs(d_ft, exist_ok=True)
    if args.force or not os.path.isdir(os.path.join(d_ft, "nafnet")):
        train_nafnet_ftl2(d_ft, args.epochs_scale)
    results["nafnet_ftl2"] = score_dir(d_ft, ("nafnet",), eval_set)["nafnet"]
    o = results["nafnet_ftl2"]["overall"]
    print(f"  nafnet_ftl2: {o['psnr']:.2f} dB / {o['ssim']:.4f}", flush=True)

    # --- the flagship profile retrained on the STRONGEST backends ---
    # (pick the best nafnet cell; expert likewise)
    naf_cells = {
        "nafnet_ref_loss": os.path.join(BENCH, "nafnet"),
        "nafnet_l2": os.path.join(d_naf, "nafnet"),
        "nafnet_ftl2": os.path.join(d_ft, "nafnet"),
    }
    best_naf = max(naf_cells, key=lambda k: results[k]["overall"]["psnr"])
    exp_cells = {
        "expert_ref_loss": os.path.join(BENCH, "expert"),
        "expert_l2": os.path.join(d_exp, "expert"),
    }
    best_exp = max(exp_cells, key=lambda k: results[k]["overall"]["psnr"])
    print(f"strongest backends: {best_naf} + {best_exp}", flush=True)

    d_hyb = os.path.join(OUT_DIR, "hybrid_l2bar")
    os.makedirs(d_hyb, exist_ok=True)
    _link(naf_cells[best_naf], os.path.join(d_hyb, "nafnet"))
    _link(exp_cells[best_exp], os.path.join(d_hyb, "expert"))
    _link(os.path.join(BENCH, "diffusion"), os.path.join(d_hyb, "diffusion"))
    if args.force or not os.path.isdir(os.path.join(d_hyb, "hybrid")):
        train_hybrid_on(d_hyb, args.epochs_scale)
    results["hybrid_l2bar"] = score_dir(d_hyb, ("hybrid",), eval_set)["hybrid"]

    # --- the table + adjudication ---
    bar = max(
        results[k]["overall"]["psnr"]
        for k in ("nafnet_ref_loss", "nafnet_l2", "nafnet_ftl2",
                  "expert_ref_loss", "expert_l2")
    )
    hdr = f"{'cell':<20}{'overall PSNR':>14}{'SSIM':>9}{'vs best single':>16}"
    print(hdr)
    print("-" * len(hdr))
    for name, r in results.items():
        o = r["overall"]
        print(f"{name:<20}{o['psnr']:>14.2f}{o['ssim']:>9.4f}"
              f"{o['psnr'] - bar:>+16.2f}", flush=True)

    best_hybrid = max(
        results["hybrid_flagship_r3"]["overall"]["psnr"],
        results["hybrid_l2bar"]["overall"]["psnr"],
    )
    verdict = (
        "flagship SURVIVES: best hybrid beats the best single model on a "
        "level playing field"
        if best_hybrid > bar
        else "flagship RE-FALSIFIED: a single model with the same loss lever "
             "matches/beats the hybrid — adopt the best single model as the "
             "quality flagship"
    )
    print(f"\nbest single {bar:.2f} vs best hybrid {best_hybrid:.2f} -> {verdict}")

    with open(args.json_out, "w") as f:
        json.dump({
            "protocol": "xraybench-v1",
            "scoring": "exact (eps=1 both paths, fp32 UNet evals)",
            "results": results,
            "best_single_psnr": bar,
            "best_hybrid_psnr": best_hybrid,
            "verdict": verdict,
        }, f, indent=1)
    print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
