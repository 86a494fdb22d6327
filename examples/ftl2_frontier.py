"""Complete the polish symmetry: does the EXPERT also gain from the l2
fine-tune lever, and does the flagship hybrid improve further when it rides
BOTH polished backends?

Round-4 state (l2_bar_study.json): the l2 fine-tune regime is the proven
lever — nafnet 45.47 -> 45.79, and the hybrid retrained on the polished
NAFNet reached 46.61 dB. The expert (42.93, reference HybridLoss: L1-led,
DirectUNet/DirectUNetModel.py:257-268) never got the same polish, and the
flagship's third branch still sees the un-polished expert. Cells:

  - expert_ftl2:      l2 fine-tune of bench_ckpts/expert (params+batch_stats
                      init, fresh low-lr cosine — the nafnet_ftl2 recipe).
  - hybrid_ftl2both:  the adopted flagship profile retrained on
                      (bench nafnet [already ftl2-polished by train_all],
                      bench diffusion, expert_ftl2).

Scored through the real engine with exact numerics (eps=1 both paths, fp32
UNet evals) next to the bench_ckpts anchors, same protocol eval set.

Adoption rule: if hybrid_ftl2both beats the bench hybrid by >= 0.1 dB, the
expert polish phase graduates into xray_bench.train_all (the shipped
pipeline); below that it is a decision record.

Usage (TPU, ~30-45 min after bench_ckpts exists):
    PYTHONPATH=/root/repo:/root/.axon_site python -u examples/ftl2_frontier.py
Writes ftl2_frontier.json; checkpoints under ablation_ckpts/ (gitignored).
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


def train_expert_ftl2(d: str, epochs_scale: float) -> None:
    """l2 fine-tune of the reference-loss expert: params + BatchNorm stats
    init from the bench checkpoint, fresh low-lr cosine, pure MSE — the
    nafnet_ftl2 recipe transplanted (lr scaled to the expert's 1e-4 base)."""
    from midd_tpu import config
    from midd_tpu.benchmarks.xray_bench import make_train_dataset
    from midd_tpu.train import recipes
    from midd_tpu.train.trainer import TrainConfig

    ds = make_train_dataset(96, 256)
    t = time.time()
    recipes.train_expert(
        ds, config.SERVE_EXPERT,
        TrainConfig(epochs=max(2, int(25 * epochs_scale)), batch_size=4,
                    lr=3e-5, weight_decay=1e-5, warmup_epochs=0,
                    eta_min_factor=0.02, ckpt_name="expert", ckpt_dir=d),
        loss_variant="l2",
        init_from=os.path.join(BENCH, "expert"),
    )
    print(f"[expert_ftl2] trained in {time.time() - t:.0f}s", flush=True)


def train_hybrid_both(d: str, epochs_scale: float) -> None:
    """The adopted flagship profile on the fully-polished backend set."""
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
    print(f"[hybrid_ftl2both] trained in {time.time() - t:.0f}s", flush=True)


def score_dir(ckpt_dir: str, paths, eval_set):
    """Reference-exact numerics, identical settings for every row."""
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
    ap.add_argument("--json-out", default=os.path.join(REPO, "ftl2_frontier.json"))
    args = ap.parse_args()

    assert os.path.isdir(os.path.join(BENCH, "expert")), (
        "bench_ckpts missing — regenerate first: python -m "
        "midd_tpu.benchmarks.xray_bench --train --ckpt-dir bench_ckpts "
        "--hybrid-profile tpu"
    )

    from midd_tpu.benchmarks.xray_bench import make_eval_set

    eval_set = make_eval_set(8, 256)
    results = {}

    # anchors: the shipped cells, scored through the identical path
    t = time.time()
    anchors = score_dir(BENCH, ("nafnet", "expert", "hybrid"), eval_set)
    results["nafnet_bench(ftl2)"] = anchors["nafnet"]
    results["expert_bench(ref_loss)"] = anchors["expert"]
    results["hybrid_bench(flagship)"] = anchors["hybrid"]
    print(f"[anchors] scored in {time.time() - t:.0f}s", flush=True)
    for k, v in results.items():
        o = v["overall"]
        print(f"  {k}: {o['psnr']:.2f} dB / {o['ssim']:.4f}", flush=True)

    d = os.path.join(OUT_DIR, "ftl2both")
    os.makedirs(d, exist_ok=True)
    _link(os.path.join(BENCH, "nafnet"), os.path.join(d, "nafnet"))
    _link(os.path.join(BENCH, "diffusion"), os.path.join(d, "diffusion"))

    if args.force or not os.path.isdir(os.path.join(d, "expert")):
        train_expert_ftl2(d, args.epochs_scale)
    results["expert_ftl2"] = score_dir(d, ("expert",), eval_set)["expert"]
    o = results["expert_ftl2"]["overall"]
    print(f"  expert_ftl2: {o['psnr']:.2f} dB / {o['ssim']:.4f}", flush=True)

    if args.force or not os.path.isdir(os.path.join(d, "hybrid")):
        train_hybrid_both(d, args.epochs_scale)
    results["hybrid_ftl2both"] = score_dir(d, ("hybrid",), eval_set)["hybrid"]
    o = results["hybrid_ftl2both"]["overall"]
    print(f"  hybrid_ftl2both: {o['psnr']:.2f} dB / {o['ssim']:.4f}", flush=True)

    base = results["hybrid_bench(flagship)"]["overall"]["psnr"]
    new = results["hybrid_ftl2both"]["overall"]["psnr"]
    verdict = (
        "ADOPT: expert polish graduates into xray_bench.train_all"
        if new - base >= 0.1 else
        "decision record: expert polish below the 0.1 dB adoption bar"
    )
    print(f"hybrid {base:.2f} -> {new:.2f} ({new - base:+.2f}) — {verdict}",
          flush=True)

    out = {
        "protocol": "xraybench-v1",
        "scoring": "exact (eps=1 both paths, fp32 UNet evals)",
        "results": results,
        "delta_vs_flagship_db": round(new - base, 3),
        "verdict": verdict,
    }
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: round(v["overall"]["psnr"], 2)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
