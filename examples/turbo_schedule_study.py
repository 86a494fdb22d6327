"""Turbo (eps-reuse) schedule study — explain the k-curve, pick the right
schedule (round-2 verdict item 5).

Round-2 ground truth showed a NON-monotonic quality curve for uniform-stride
eps reuse at "8 steps" (actually a 9-step rollout, timestep_sequence(50,8)):
k=2 (5 UNet evals) costs −0.70 dB on the standalone diffusion path while k=3
(3 evals!) costs only −0.14 dB. Fewer evaluations, better quality — so the
schedule SHAPE, not the eval count, is what matters, and the adopted k=2
default was picked without understanding it.

This script measures, against xraybench-v1 ground truth with the trained
serve-width checkpoint:
  1. leave-one-out sensitivity: exact rollout except ONE step reuses stale
     eps — the per-step cost curve;
  2. an exhaustive budget sweep: every refresh_schedule mode x eval budget,
     plus ALL 2^(n-1) masks at the cheapest budgets (n=9 makes brute force
     trivial) — the true frontier;
  3. the round-2 uniform k=2/k=3 points for continuity.

One compiled program serves every mask (the refresh mask is a runtime
operand — sampler.denoise(eps_refresh_idx=<bool array>)).

Usage: python examples/turbo_schedule_study.py [--ckpt-dir bench_ckpts]
Writes turbo_schedule_study.json.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", default=os.path.join(REPO, "bench_ckpts"))
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--brute-max-evals", type=int, default=4,
                    help="exhaustively try every mask with <= this many evals"
                         " (rollouts <= 12 steps only)")
    ap.add_argument("--greedy-max-evals", type=int, default=14,
                    help="long rollouts: greedy forward selection up to this"
                         " budget (stops early once quality-free)")
    ap.add_argument("--quality-free-db", type=float, default=0.01,
                    help="greedy stops when |delta| <= this")
    ap.add_argument("--json-out",
                    default=os.path.join(REPO, "turbo_schedule_study.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from midd_tpu import config
    from midd_tpu.benchmarks.xray_bench import make_eval_set
    from midd_tpu.diffusion import denoise, make_schedule
    from midd_tpu.diffusion.sampler import refresh_schedule
    from midd_tpu.diffusion.schedule import timestep_sequence
    from midd_tpu.models import UNetDiffusion
    from midd_tpu.train.metrics import compute_metrics
    from midd_tpu.utils.checkpoint import load_checkpoint
    from midd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    tree, meta = load_checkpoint(os.path.join(args.ckpt_dir, "diffusion"))
    params = tree["params"]
    mc = int(meta.get("model_channels", 48))
    unet = UNetDiffusion(
        config.DiffusionUNetConfig(model_channels=mc),
        use_flash=jax.default_backend() in ("tpu", "axon"),
    )
    schedule = make_schedule(
        config.ScheduleConfig(noise_steps=int(meta.get("noise_steps", 50)))
    )
    n_steps = len(timestep_sequence(schedule.noise_steps, args.steps))
    print(f"rollout length: {n_steps} (requested {args.steps})")

    @jax.jit
    def roll(x, mask):
        eps = lambda a, c, t: unet.apply({"params": params}, a, c, t)
        out = denoise(eps, x, schedule, args.steps, eps_refresh_idx=mask)
        return jnp.clip(out, 0.0, 1.0)

    eval_set = make_eval_set(8, args.img_size)

    def score(mask_bools) -> dict:
        mask = jnp.asarray(mask_bools, jnp.bool_)
        ps, ss = [], []
        for i in range(0, len(eval_set), 8):
            chunk = eval_set[i : i + 8]
            noisy = jnp.asarray(np.stack([c[1] for c in chunk]))
            pred = roll(noisy, mask)
            for j, (clean, _, _) in enumerate(chunk):
                p, s = compute_metrics(pred[j : j + 1], jnp.asarray(clean[None]))
                if np.isfinite(float(p)):
                    ps.append(float(p))
                    ss.append(float(s))
        return {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss)),
                "n_evals": int(np.sum(mask_bools))}

    def mask_from_idx(idx):
        return [i in set(idx) for i in range(n_steps)]

    results = {}
    t0 = time.time()
    results["exact"] = score([True] * n_steps)
    print(f"exact: {results['exact']['psnr']:.3f} dB "
          f"(compile+score {time.time() - t0:.0f}s)")
    exact_psnr = results["exact"]["psnr"]

    # 1. leave-one-out sensitivity
    loo = {}
    for i in range(1, n_steps):
        m = [True] * n_steps
        m[i] = False
        r = score(m)
        loo[str(i)] = {**r, "delta_db": r["psnr"] - exact_psnr}
        print(f"stale@{i}: {r['psnr'] - exact_psnr:+.3f} dB")
    results["leave_one_out"] = loo

    # 2. named schedules at budgets (long rollouts: a log-spaced subset —
    # 48 budgets x 4 modes at 50 steps would be pure tunnel time)
    if n_steps <= 12:
        budgets = range(2, n_steps)
    else:
        budgets = sorted({3, 5, 7, 9, 13, 17, 25, (n_steps + 1) // 2,
                          (n_steps + 2) // 3} & set(range(2, n_steps)))
    named = {}
    for n_evals in budgets:
        for mode in ("uniform", "last", "front", "tail"):
            idx = refresh_schedule(n_steps, n_evals, mode)
            r = score(mask_from_idx(idx))
            named[f"{mode}_{n_evals}"] = {
                **r, "idx": list(idx), "delta_db": r["psnr"] - exact_psnr,
            }
    results["named"] = named

    # round-2 continuity points (uniform stride over the ACTUAL length)
    for k in (2, 3):
        idx = tuple(range(0, n_steps, k))
        r = score(mask_from_idx(idx))
        results[f"stride_k{k}"] = {
            **r, "idx": list(idx), "delta_db": r["psnr"] - exact_psnr,
        }
        print(f"stride k={k}: {r['psnr'] - exact_psnr:+.3f} dB "
              f"({r['n_evals']} evals)")

    # 3a. exhaustive frontier at small budgets (step 0 always fresh) —
    # tractable only for short rollouts (9 steps: C(8, <=3) masks)
    if n_steps <= 12:
        brute = []
        for n_evals in range(2, args.brute_max_evals + 1):
            best = None
            for combo in itertools.combinations(range(1, n_steps), n_evals - 1):
                idx = (0,) + combo
                r = score(mask_from_idx(idx))
                if best is None or r["psnr"] > best["psnr"]:
                    best = {**r, "idx": list(idx)}
            best["delta_db"] = best["psnr"] - exact_psnr
            brute.append(best)
            print(f"best @{n_evals} evals: idx={best['idx']} "
                  f"{best['delta_db']:+.3f} dB")
        results["brute_best"] = brute
    else:
        # 3b. greedy forward selection: start from {0} (the sampler always
        # evaluates step 0 — there is no stale eps to reuse yet), repeatedly
        # add the single refresh index that maximizes PSNR. Effects are
        # non-additive (PARITY round-3: consecutive stale steps partially
        # cancel), so candidates stay unpruned — every absent index is tried
        # at every level. Stops once quality-free vs exact.
        chosen = [0]
        greedy = []
        while len(chosen) < args.greedy_max_evals:
            best = None
            for cand in range(1, n_steps):
                if cand in chosen:
                    continue
                r = score(mask_from_idx(chosen + [cand]))
                if best is None or r["psnr"] > best[0]["psnr"]:
                    best = (r, cand)
            chosen.append(best[1])
            chosen.sort()
            entry = {**best[0], "idx": list(chosen),
                     "delta_db": best[0]["psnr"] - exact_psnr}
            greedy.append(entry)
            print(f"greedy @{len(chosen)} evals: +{best[1]} -> idx={chosen} "
                  f"{entry['delta_db']:+.3f} dB")
            if entry["delta_db"] >= -args.quality_free_db:
                break
        results["greedy"] = greedy

    payload = {
        "protocol": "xraybench-v1",
        "ckpt_dir": args.ckpt_dir,
        "steps_requested": args.steps,
        "rollout_length": n_steps,
        "results": results,
    }
    with open(args.json_out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.json_out} in {time.time() - t0:.0f}s total")


if __name__ == "__main__":
    main()
