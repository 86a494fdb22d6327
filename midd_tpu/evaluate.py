"""Dataset evaluation: PSNR/SSIM of any model path over a paired test set —
how the reference's headline numbers (35.80 dB / 0.9282 SSIM, README.md:20-21)
are measured.

    python -m midd_tpu.evaluate --model hybrid --clear-dir data/clean \
        --noisy-dirs data/noisy --ckpt-dir checkpoints [--tta]
"""

from __future__ import annotations

import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def evaluate(
    model: str,
    dataset,
    ckpt_dir: str = "checkpoints",
    img_size: int = 512,
    steps: int = 8,
    tta: bool = False,
    bf16: bool = False,
    batch_size: int = 1,
    engine_kwargs: Optional[dict] = None,
    engine: Optional[object] = None,
    serving_defaults: bool = False,
):
    """``serving_defaults=False`` (the default) pins the gated-non-exact
    engine defaults OFF — this is a measurement tool, and quality numbers
    compared against the reference must not silently include the turbo
    refresh schedule or bf16 UNet evals (same pinning as xray_bench's
    protocol). Pass True to measure what the serving stack actually ships."""
    from midd_tpu.inference import tta_4flip
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine
    from midd_tpu.train.metrics import compute_metrics

    if engine is None:
        kw = dict(engine_kwargs or {})
        if not serving_defaults:
            kw.setdefault("turbo_eps_reuse", 1)
            kw.setdefault("hybrid_turbo_eps_reuse", 1)
            kw.setdefault("diffusion_eval_bf16", False)
            kw.setdefault("hybrid_rollout_bf16", False)
        cfg = EngineConfig(
            img_size=img_size,
            diffusion_steps=steps,
            hybrid_diffusion_steps=steps,
            ckpt_dir=ckpt_dir,
            compute_dtype=jnp.bfloat16 if bf16 else None,
            warmup=False,
            **kw,
        )
        engine = InferenceEngine(cfg)
    fn = engine.fns[model]
    if tta:
        fn = jax.jit(tta_4flip(fn))

    psnrs, ssims, times = [], [], []
    for i in range(len(dataset)):
        clean, noisy = dataset[i]
        x = jnp.asarray(noisy[None])
        t0 = time.time()
        pred = fn(x)
        pred.block_until_ready()
        if i > 0:  # skip compile time
            times.append(time.time() - t0)
        p, s = compute_metrics(pred, jnp.asarray(clean[None]))
        if np.isfinite(float(p)):
            psnrs.append(float(p))
            ssims.append(float(s))

    return {
        "model": model,
        "n": len(psnrs),
        "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
        "ssim": float(np.mean(ssims)) if ssims else float("nan"),
        "p50_latency_s": float(np.median(times)) if times else float("nan"),
    }


def main():
    import argparse

    from midd_tpu.train.data import PairedXRayDataset

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True,
                    choices=["diffusion", "nafnet", "expert", "hybrid"])
    ap.add_argument("--clear-dir", required=True)
    ap.add_argument("--noisy-dirs", nargs="+", required=True)
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--max-samples", type=int, default=500)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--serving-defaults", action="store_true",
                    help="measure the gated-non-exact serving stack "
                         "(turbo refresh schedule + bf16 UNet evals) instead "
                         "of the default reference-exact numerics")
    args = ap.parse_args()

    dataset = PairedXRayDataset(
        args.clear_dir,
        args.noisy_dirs,
        img_size=args.img_size,
        max_samples=args.max_samples,
        is_train=False,
    )
    result = evaluate(
        args.model,
        dataset,
        ckpt_dir=args.ckpt_dir,
        img_size=args.img_size,
        steps=args.steps,
        tta=args.tta,
        bf16=args.bf16,
        serving_defaults=args.serving_defaults,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
