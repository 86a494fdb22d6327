"""Training benchmark of record: ms/step + model-FLOP MFU for the diffusion
and NAFNet recipes (round-3 verdict item 4 — training gets the same measured
utilization treatment round 3 gave inference).

What it measures, per (model, img_size, batch):
- ms/step of the REAL jitted train step (value_and_grad + AdamW update,
  donated carries), scan-amortized (CLAUDE.md timing rules: the ~30 ms
  tunnel round-trip otherwise dominates);
- model FLOPs of fwd+bwd via the jaxpr walk (utils/flops.py; flash attention
  counted through the equivalent XLA attention graph) -> achieved TFLOP/s
  and MFU vs published chip peak;
- the lane-padded envelope MFU (every GEMM dim rounded to MXU tiles): the
  utilization number against the hardware work actually issued.

Also:
- remat on/off at 512² (re-checked on the post-GroupNorm-fix denominator:
  the round-2 conclusion "remat slower, not spill-bound" predates an ~11%
  faster forward);
- input-pipeline overlap: the full host pipeline (threaded batch assembly +
  background device prefetch, train/data.py) vs the device-only step rate —
  occupancy ~1.0 means prefetch fully hides host work.

Prints ONE JSON line on stdout (written to bench_train.json too);
diagnostics on stderr. Reference trainer being modeled:
DDIM/DDIMModel.py:302-468 and NafNet/NafnetModel.py:405-624.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python -u bench_train.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_step(model_kind: str, img_size: int, batch: int, remat: bool,
              use_flash: bool):
    """Returns (run(params, opt, clean, noisy, key) scan-jit, init fn,
    flop_count_fn)."""
    import jax
    import jax.numpy as jnp
    import optax

    from midd_tpu import config
    from midd_tpu.diffusion import make_schedule
    from midd_tpu.train.trainer import (
        TrainConfig,
        diffusion_loss_fn,
        make_optimizer,
        nafnet_loss_fn,
    )

    dtype = jnp.bfloat16
    if model_kind == "diffusion":
        from midd_tpu.models import UNetDiffusion

        schedule = make_schedule(config.SERVE_SCHEDULE)
        model = UNetDiffusion(config.SERVE_DIFFUSION, dtype=dtype,
                              use_flash=use_flash)
        count_model = UNetDiffusion(config.SERVE_DIFFUSION, dtype=dtype,
                                    use_flash=False)
        loss_fn = diffusion_loss_fn(model, schedule)
        count_loss_fn = diffusion_loss_fn(count_model, schedule)
        tx = make_optimizer(TrainConfig(lr=2e-4, weight_decay=1e-4))

        def init(key):
            x0 = jnp.zeros((batch, img_size, img_size, 1), jnp.float32)
            t0 = jnp.zeros((batch,), jnp.int32)
            return jax.jit(model.init)(key, x0, x0, t0)["params"]
    else:
        from midd_tpu.models import EnhancedNAFNet

        # "nafnet_s2d" = the round-5 train_nafnet(s2d_stage0=True) layout
        # lever (numerically equivalent, same param tree); model FLOPs are
        # counted on the PLAIN layout — the canonical work — so the two
        # rows' MFU is directly comparable (s2d executes extra MACs on
        # structural zeros, like the inference bench's accounting note)
        model = EnhancedNAFNet(config.SERVE_NAFNET, dtype=dtype,
                               s2d_stage0=model_kind == "nafnet_s2d")
        count_model = EnhancedNAFNet(config.SERVE_NAFNET, dtype=dtype)
        loss_fn = nafnet_loss_fn(model)
        count_loss_fn = nafnet_loss_fn(count_model)
        tx = make_optimizer(TrainConfig(lr=2e-4, weight_decay=1e-4))

        def init(key):
            x0 = jnp.zeros((1, img_size, img_size, 1), jnp.float32)
            return jax.jit(model.init)(key, x0)["params"]

    lfn = jax.checkpoint(loss_fn) if remat else loss_fn

    def one_step(carry, xs):
        params, opt_state = carry
        clean, noisy, key = xs
        (loss, _), grads = jax.value_and_grad(lfn, has_aux=True)(
            params, (clean, noisy), key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def run(params, opt_state, clean, noisy, key):
        keys = jax.random.split(key, clean.shape[0])
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), (clean, noisy, keys)
        )
        return params, opt_state, losses

    def flops_fwd_bwd(params):
        from midd_tpu.utils.flops import count_flops

        import numpy as np

        key = jax.random.PRNGKey(0)
        clean = jnp.zeros((batch, img_size, img_size, 1), jnp.float32)
        vg = jax.value_and_grad(count_loss_fn, has_aux=True)
        model_f = count_flops(vg, params, (clean, clean), key)
        padded_f = count_flops(vg, params, (clean, clean), key,
                               lane_pad=(8, 128))
        return model_f, padded_f

    return run, init, tx, flops_fwd_bwd


def time_step(model_kind, img_size, batch, remat=False, inner=8, reps=3,
              use_flash=True):
    import jax
    import jax.numpy as jnp
    import numpy as np

    run, init, tx, flops_fn = make_step(model_kind, img_size, batch, remat,
                                        use_flash)
    params = init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)

    def batch_stack(seed):
        r = np.random.default_rng(seed)
        clean = np.clip(r.random((inner, batch, img_size, img_size, 1)), 0, 1
                        ).astype(np.float32)
        noisy = np.clip(clean + r.normal(0, 0.1, clean.shape), 0, 1
                        ).astype(np.float32)
        return jnp.asarray(clean), jnp.asarray(noisy)

    c, n = batch_stack(1)
    t = time.time()
    params, opt_state, losses = run(params, opt_state, c, n, jax.random.PRNGKey(1))
    float(jnp.sum(losses))  # forced materialisation (tunnel semantics)
    log(f"  compile+first {time.time() - t:.1f}s")

    best = float("inf")
    for rep in range(reps):
        c, n = batch_stack(100 + rep)
        t = time.time()
        params, opt_state, losses = run(params, opt_state, c, n,
                                        jax.random.PRNGKey(2 + rep))
        float(jnp.sum(losses))
        best = min(best, (time.time() - t) / inner)
    model_f, padded_f = flops_fn(params)
    return best, model_f, padded_f


def pipeline_occupancy(model_kind, img_size, batch, device_ms, n_imgs=64,
                       use_flash=True):
    """The REAL input pipeline (SyntheticPairedDataset host noise synthesis
    -> threaded batches() -> prefetch_to_device) driving the jitted step:
    occupancy = device-only time / achieved wall time per step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from midd_tpu.benchmarks.xray_bench import make_phantoms
    from midd_tpu.train.data import SyntheticPairedDataset, batches, prefetch_to_device

    run, init, tx, _ = make_step(model_kind, img_size, batch, False, use_flash)
    params = init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)

    ds = SyntheticPairedDataset(
        make_phantoms(n_imgs, img_size, seed=5), noise_type="gaussian", seed=0
    )

    def epoch():
        nonlocal params, opt_state
        it = prefetch_to_device(
            batches(ds, batch, shuffle=True, seed=1, num_workers=2), size=2
        )
        count = 0
        # group into scan stacks of 1 (inner=1): per-batch dispatch like the
        # real Trainer loop — that is the pipeline being measured
        for clean, noisy in it:
            params, opt_state, loss = run(
                params, opt_state, clean[None], noisy[None], jax.random.PRNGKey(count)
            )
            count += 1
        float(jnp.sum(loss))
        return count

    epoch()  # compile (inner=1 program) + warm the thread pool
    t = time.time()
    steps = epoch()
    wall_ms = (time.time() - t) / steps * 1e3
    return device_ms / wall_ms, wall_ms


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="single cell per model (CI smoke)")
    ap.add_argument("--models", default=None,
                    help="comma-separated subset of the grid's model kinds "
                         "(e.g. nafnet,nafnet_s2d); remat/pipeline extras "
                         "only run for cells that are present")
    ap.add_argument("--json-out", default="bench_train.json")
    args = ap.parse_args()

    import jax

    from midd_tpu.utils.compile_cache import enable_persistent_cache
    from midd_tpu.utils.flops import device_peak_tflops

    enable_persistent_cache()
    dev = jax.devices()[0]
    use_flash = dev.platform in ("tpu", "axon")
    peak = device_peak_tflops(dev)
    log(f"device: {dev}, peak {peak} TFLOP/s bf16, flash={use_flash}")

    grid = {
        "diffusion": [(256, 2), (256, 4), (256, 8), (256, 16), (512, 2), (512, 4)],
        "nafnet": [(256, 2), (256, 4), (256, 8), (256, 16), (512, 2), (512, 4)],
        "nafnet_s2d": [(256, 2), (256, 8), (512, 2), (512, 4)],
    }
    if args.quick:
        grid = {"diffusion": [(256, 2)], "nafnet": [(256, 2)]}
    if args.models:
        keep = {m.strip() for m in args.models.split(",") if m.strip()}
        grid = {k: v for k, v in grid.items() if k in keep}

    rows = []
    for model_kind, cells in grid.items():
        for img, b in cells:
            log(f"[{model_kind} {img}² b{b}]")
            dt, model_f, padded_f = time_step(
                model_kind, img, b, inner=args.inner, reps=args.reps,
                use_flash=use_flash,
            )
            row = {
                "model": model_kind, "img": img, "batch": b,
                "ms_per_step": round(dt * 1e3, 1),
                "imgs_per_s": round(b / dt, 2),
                "model_tflop_per_step": round(model_f / 1e12, 3),
                "mfu": round(model_f / dt / (peak * 1e12), 4),
                "mfu_lane_padded": round(padded_f / dt / (peak * 1e12), 4),
            }
            rows.append(row)
            log(f"  {row['ms_per_step']} ms/step, {row['imgs_per_s']} img/s, "
                f"MFU {row['mfu'] * 100:.1f}% model / "
                f"{row['mfu_lane_padded'] * 100:.1f}% lane-padded")

    # remat re-check at 512² b2 (post-norm-fix denominator)
    remat = {}
    if not args.quick:
        for model_kind in ("diffusion", "nafnet"):
            base = next((r for r in rows
                         if r["model"] == model_kind and r["img"] == 512
                         and r["batch"] == 2), None)
            if base is None:
                continue
            log(f"[{model_kind} 512² b2 remat]")
            dt_r, _, _ = time_step(model_kind, 512, 2, remat=True,
                                   inner=args.inner, reps=args.reps,
                                   use_flash=use_flash)
            remat[model_kind] = {
                "ms_per_step": round(dt_r * 1e3, 1),
                "vs_base": round(dt_r * 1e3 / base["ms_per_step"], 3),
            }
            log(f"  remat {remat[model_kind]['ms_per_step']} ms/step "
                f"({remat[model_kind]['vs_base']}x base)")

    # input-pipeline overlap at the reference recipe operating points
    pipeline = {}
    for model_kind, img, b in (("diffusion", 256, 2), ("nafnet", 256, 2)):
        base = next((r for r in rows if r["model"] == model_kind
                     and r["img"] == img and r["batch"] == b), None)
        if base is None:
            continue
        log(f"[{model_kind} {img}² b{b} pipeline]")
        occ, wall_ms = pipeline_occupancy(
            model_kind, img, b, base["ms_per_step"], use_flash=use_flash
        )
        pipeline[model_kind] = {
            "wall_ms_per_step": round(wall_ms, 1),
            "occupancy": round(occ, 3),
        }
        log(f"  wall {wall_ms:.1f} ms/step, occupancy {occ:.2f}")

    result = {
        "metric": "train ms/step + MFU (diffusion & nafnet recipes, bf16)",
        "device": str(dev.device_kind),
        "peak_tflops_assumed": peak,
        "rows": rows,
        "remat_512_b2": remat,
        "pipeline": pipeline,
    }
    with open(args.json_out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
