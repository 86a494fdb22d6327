"""Measure the two round-4 UNet restructurings on TPU:

- FusedUpDown: the ddim ping-pong's ``down2 ∘ ConvTranspose`` collapsed to
  one conv at the input resolution (~19% of model conv FLOPs removed, exact).
- Stage-0 space-to-depth layout (ops/unet_s2d.py) — the s2d-conv probe's
  predicted ~5-8% forward lever.

Times the full serving forward (scan-20 amortised, one device sync per
measurement, distinct dtype-preserving inputs) in all four flag combinations
at the bench shape (256² b8) and the hybrid serving shape (512² b2/b1), and
the full bench-of-record rollout for the winning combination.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u examples/unet_restructure_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_SCAN = 20
N_PASSES = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from midd_tpu import config
    from midd_tpu.models import UNetDiffusion
    from midd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dt = jnp.bfloat16 if on_tpu else None
    log(f"device: {dev}")

    rng = np.random.default_rng(0)
    results = {}

    x0 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    t0 = jnp.zeros((1,), jnp.int32)
    base = UNetDiffusion(config.SERVE_DIFFUSION)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), x0, x0, t0)

    combos = {
        "plain": dict(fuse_updown=False, s2d_stage0=False),
        "fused": dict(fuse_updown=True, s2d_stage0=False),
        "s2d": dict(fuse_updown=False, s2d_stage0=True),
        "fused+s2d": dict(fuse_updown=True, s2d_stage0=True),
    }

    for (size, b) in ((256, 8), (512, 2), (512, 1)):
        key = f"{size}x{size} b{b}"
        results[key] = {}
        for name, flags in combos.items():
            model = UNetDiffusion(
                config.SERVE_DIFFUSION, dtype=dt, use_flash=on_tpu, **flags
            )

            @jax.jit
            def fwd20(x, c, t):
                def body(carry, _):
                    xx, cc = carry
                    y = model.apply(variables, xx, cc, t)
                    # dtype-preserving perturbation; feeds back so steps chain
                    return (xx + y.astype(xx.dtype) * jnp.asarray(1e-3, xx.dtype), cc), ()

                (out, _), _ = jax.lax.scan(body, (x, c), None, length=N_SCAN)
                return out

            xs = [
                jnp.asarray(
                    np.clip(rng.random((b, size, size, 1)), 0, 1).astype(np.float32)
                )
                for _ in range(N_PASSES + 1)
            ]
            cond = xs[-1]
            tt = jnp.full((b,), 25, jnp.int32)
            t = time.time()
            float(jnp.sum(fwd20(xs[-1], cond, tt)))
            log(f"{key} {name}: compile {time.time() - t:.1f}s")
            best = float("inf")
            for p in range(N_PASSES):
                t = time.time()
                float(jnp.sum(fwd20(xs[p], cond, tt)))
                best = min(best, (time.time() - t) / N_SCAN)
            ms = best * 1000
            results[key][name] = round(ms, 3)
            log(f"  {key} {name}: {ms:.2f} ms/fwd ({ms / b:.2f} ms/img)")

    # cross-check vs the plain combination
    for key, row in results.items():
        p = row["plain"]
        log(
            f"{key}: fused {p / row['fused']:.3f}x, s2d {p / row['s2d']:.3f}x, "
            f"both {p / row['fused+s2d']:.3f}x"
        )

    out_path = os.path.join(os.path.dirname(__file__), "..", "unet_restructure_bench.json")
    with open(out_path, "w") as f:
        json.dump({"device": str(dev), "n_scan": N_SCAN, "results": results}, f, indent=2)
    log(f"wrote {out_path}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
