"""Timing-only refresh of the PARITY frontier throughput columns (TPU).

Rollout throughput is weight-independent, so after a compute-path change
(round-3: channels-minor one-pass GroupNorm, stencil 2x resizes) the
recorded img/s columns can be refreshed with randomly-initialized models —
quality columns stay owned by the trained-checkpoint studies
(wide_study.json, turbo_gate_*.json), which the math-identical change does
not move.

Rows: w48/w96 x steps {8, 50} exact, plus w48-50 uniform turbo k in {2, 3}
(the round-1 turbo frontier rows). b8, bf16, serving schedule, distinct
inputs per timed call (CLAUDE.md rules). Writes rollout_timing_refresh.json.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU smoke: batch 1, short rollouts")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import time

    import jax
    import jax.numpy as jnp

    from midd_tpu import config
    from midd_tpu.diffusion import denoise
    from midd_tpu.diffusion import make_schedule
    from midd_tpu.models.unet_diffusion import UNetDiffusion
    from midd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else None
    log(f"device: {dev}")

    batch, size = (1 if args.smoke else 8), args.img_size
    step_list = (2,) if args.smoke else (8, 50)
    schedule = make_schedule()
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(
            np.clip(rng.random((batch, size, size, 1)), 0, 1).astype(np.float32)
        )
        for _ in range(4)
    ]

    def time_rollout(model, variables, steps, eps_reuse=1):
        @jax.jit
        def rollout(x):
            eps = lambda a, c, t: model.apply(variables, a, c, t)
            return denoise(
                eps, x, schedule, inference_steps=steps, eps_reuse=eps_reuse
            )

        t = time.time()
        float(jnp.sum(rollout(xs[-1]).astype(jnp.float32)))
        log(f"  compile {time.time() - t:.1f}s")
        t = time.time()
        _ = sum(float(jnp.sum(rollout(x).astype(jnp.float32))) for x in xs[:3])
        return batch / ((time.time() - t) / 3)

    results = {}
    for tag, mcfg in [
        ("w48", config.SERVE_DIFFUSION),
        ("w96", config.WIDE_DIFFUSION),
    ]:
        model = UNetDiffusion(mcfg, dtype=dtype, use_flash=on_tpu)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            xs[0][:1], xs[0][:1], jnp.full((1,), 25, jnp.int32),
        )
        for steps in step_list:
            ips = time_rollout(model, variables, steps)
            results[f"{tag}_steps{steps}"] = round(ips, 2)
            log(f"{tag} steps={steps}: {ips:.2f} img/s")
        if tag == "w48" and not args.smoke:
            for k in (2, 3):
                ips = time_rollout(model, variables, 50, eps_reuse=k)
                results[f"w48_steps50_turbo_k{k}"] = round(ips, 2)
                log(f"w48 steps=50 turbo k={k}: {ips:.2f} img/s")

    out = {"device": str(dev), "batch": batch, "size": size,
           "img_per_s_b8": results}
    with open("rollout_timing_refresh.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
