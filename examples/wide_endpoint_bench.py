"""Endpoint-level latency for a checkpoint profile at serving resolution —
the round-2 verdict item 2 "endpoint quality/latency row" measurement.

Times, fresh-engine, at --img-size (default 512):
  - hybrid single-image latency (p50 of N distinct images);
  - full 4-model /denoise-equivalent device work (process_all path);
per the CLAUDE.md timing rules (distinct inputs, forced materialisation).

Usage:
    python examples/wide_endpoint_bench.py --ckpt-dir ablation_ckpts/residual_w96
Writes/updates wide_endpoint_bench.json keyed by ckpt-dir basename.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--diffusion-eps", default="1",
                    help="standalone rollout eps: int k, comma indices, or "
                         "'auto' (the serving default)")
    ap.add_argument("--hybrid-eps", default="1",
                    help="hybrid eps setting: int k or comma list of refresh "
                         "indices")
    ap.add_argument("--json-out",
                    default=os.path.join(REPO, "wide_endpoint_bench.json"))
    args = ap.parse_args()

    import jax.numpy as jnp

    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    def _eps(v):
        if v == "auto":
            return v
        return tuple(int(x) for x in v.split(",")) if "," in v else int(v)

    eps = _eps(args.hybrid_eps)
    deps = _eps(args.diffusion_eps)
    t0 = time.time()
    eng = InferenceEngine(EngineConfig(
        img_size=args.img_size,
        diffusion_steps=args.steps,
        hybrid_diffusion_steps=args.steps,
        ckpt_dir=args.ckpt_dir,
        warmup=True,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        turbo_eps_reuse=deps,
        hybrid_turbo_eps_reuse=eps,
    ))
    log(f"engine warm in {time.time() - t0:.0f}s")

    rng = np.random.default_rng(0)
    s = args.img_size
    xs = [
        jnp.asarray(np.clip(rng.random((1, s, s, 1)), 0, 1).astype(np.float32))
        for _ in range(args.n + 1)
    ]

    def p50(fn):
        float(jnp.sum(fn(xs[-1])))  # warm
        ts = []
        for x in xs[: args.n]:
            t = time.time()
            float(jnp.sum(fn(x)))
            ts.append(time.time() - t)
        return float(np.median(ts))

    hybrid_ms = p50(eng.fns["hybrid"]) * 1e3
    log(f"hybrid single-image p50: {hybrid_ms:.0f} ms")

    def all4(x):
        outs = [eng.fns[n](x) for n in ("diffusion", "nafnet", "expert", "hybrid")]
        return sum(float(jnp.sum(o)) for o in outs)

    all4(xs[-1])
    ts = []
    for x in xs[: args.n]:
        t = time.time()
        all4(x)
        ts.append(time.time() - t)
    all4_ms = float(np.median(ts)) * 1e3
    log(f"all-4 request device work p50: {all4_ms:.0f} ms")

    key = os.path.basename(os.path.normpath(args.ckpt_dir))
    row = {
        "img_size": s, "steps": args.steps, "bf16": args.bf16,
        "hybrid_eps": args.hybrid_eps,
        "diffusion_eps": args.diffusion_eps,
        "hybrid_p50_ms": round(hybrid_ms, 1),
        "all4_p50_ms": round(all4_ms, 1),
    }
    data = {}
    if os.path.exists(args.json_out):
        with open(args.json_out) as f:
            data = json.load(f)
    data[f"{key}@{s}" + ("/bf16" if args.bf16 else "")] = row
    with open(args.json_out, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps({key: row}))


if __name__ == "__main__":
    main()
