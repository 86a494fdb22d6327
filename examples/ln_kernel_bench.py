"""Per-stage LayerNorm2d cost: XLA vs Pallas kernel, WITH the consumer conv.

naf_norm_bench.py showed LayerNorm2d ≈ 35% of the NAFNet forward, but a
whole-model swap to the fused kernel measured SLOWER — hypothesis: XLA fuses
the normalize+affine chain into the following 1x1 conv's operand read, so a
standalone kernel adds one full write+read the XLA path doesn't pay, and the
win/loss balance is stage-dependent. This bench times, per NAFNet stage
shape (b8, bf16):

  conv        1x1 conv C->2C alone (the floor)
  xla+conv    _ln2d_xla -> conv     (what the model does today, fused by XLA)
  ker+conv    ln2d_fused -> conv    (Pallas kernel + conv)

scan-20 amortized, dtype-preserving perturbations. Writes ln_kernel_bench.json.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_SCAN = 20
N_TIMED = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from midd_tpu.ops.ln2d import _ln2d_xla, ln2d_fused
    from midd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    log(f"device: {dev}")

    b = args.batch
    # NAFNet serving stages at 512^2: (H, W, C); encoder+decoder visit each
    stages = [
        (512, 512, 32),
        (256, 256, 64),
        (128, 128, 128),
        (64, 64, 256),
        (32, 32, 512),
    ]

    rng = np.random.default_rng(0)
    results = {}
    for h, w, c in stages:
        x = jnp.asarray(rng.random((b, h, w, c)).astype(np.float32) + 0.5)
        x = x.astype(dtype)
        scale = jnp.asarray(rng.random(c).astype(np.float32))
        bias = jnp.asarray(rng.random(c).astype(np.float32))
        wk = jnp.asarray(
            (rng.random((1, 1, c, 2 * c)).astype(np.float32) - 0.5) * 0.1
        ).astype(dtype)

        def conv(z):
            return jax.lax.conv_general_dilated(
                z, wk, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        variants = {
            "conv": lambda z: conv(z),
            "xla+conv": lambda z: conv(_ln2d_xla(z, scale, bias, 1e-6)),
            "ker+conv": lambda z: conv(ln2d_fused(z, scale, bias, 1e-6)),
        }
        row = {}
        for name, fn in variants.items():
            def scanned(z0):
                def step(cst, _):
                    y = fn(cst)
                    # keep shape constant: fold 2C back to C
                    return (y[..., :c] + y[..., c:]).astype(cst.dtype), None
                return jax.lax.scan(step, z0, None, length=N_SCAN)[0]

            jf = jax.jit(scanned)
            t = time.time()
            float(jnp.sum(jf(x).astype(jnp.float32)))
            log(f"  {h}x{w}x{c} {name}: compile {time.time()-t:.1f}s")
            xs = [(x + jnp.asarray(i * 1e-3, x.dtype)).astype(x.dtype)
                  for i in range(1, N_TIMED + 1)]
            t = time.time()
            _ = sum(float(jnp.sum(jf(z).astype(jnp.float32))) for z in xs)
            ms = (time.time() - t) / (N_TIMED * N_SCAN) * 1e3
            row[name] = round(ms, 3)
            log(f"  {h}x{w}x{c} {name}: {ms:8.3f} ms")
        row["ln_cost_xla"] = round(row["xla+conv"] - row["conv"], 3)
        row["ln_cost_ker"] = round(row["ker+conv"] - row["conv"], 3)
        results[f"{h}x{w}x{c}"] = row
        log(f"{h}x{w}x{c}: LN cost xla {row['ln_cost_xla']} ms, "
            f"kernel {row['ln_cost_ker']} ms")

    out = {"device": str(dev), "batch": b, "stages": results}
    with open("ln_kernel_bench.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
