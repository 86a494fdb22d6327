"""Pay-or-kill measurement for the NAFNet space-to-depth stage-0 layout
(round-3 verdict item 3): b8/b1 512² forward, plain vs s2d, plus the all-4
endpoint device work delta through the real engine.

Decision rule (verdict): adopt as the serving default if the ENDPOINT win is
>= 10%; otherwise keep as a measured opt-in with a decision record
(EngineConfig.nafnet_s2d).

Timing rules (CLAUDE.md): scan-amortized, distinct dtype-preserving inputs,
forced materialisation, best-of-N passes (tunnel variance ~10%).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u examples/naf_s2d_bench.py
"""

from __future__ import annotations

import argparse
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


def time_forward(model, variables, x0, jnp, jax):
    def scan_fwd(v, z):
        def step(c, _):
            return model.apply(v, c).astype(z.dtype), None

        return jax.lax.scan(step, z, None, length=N_SCAN)[0]

    f = jax.jit(scan_fwd)
    t = time.time()
    float(jnp.sum(f(variables, x0).astype(jnp.float32)))
    log(f"  compile {time.time() - t:.1f}s")
    best = float("inf")
    for i in range(N_PASSES):
        z = (x0 + jnp.asarray((i + 1) * 1e-3, x0.dtype)).astype(x0.dtype)
        t = time.time()
        float(jnp.sum(f(variables, z).astype(jnp.float32)))
        best = min(best, (time.time() - t) / N_SCAN)
    return best * 1e3  # ms


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--skip-endpoint", action="store_true")
    ap.add_argument("--json-out", default="naf_s2d_bench.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from midd_tpu import config
    from midd_tpu.models import EnhancedNAFNet
    from midd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else None
    log(f"device: {dev}")

    results = {"size": args.size}
    plain = EnhancedNAFNet(config.SERVE_NAFNET, dtype=dtype)
    s2dm = EnhancedNAFNet(config.SERVE_NAFNET, dtype=dtype, s2d_stage0=True)
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.random((1, args.size, args.size, 1)).astype(np.float32))
    variables = jax.jit(plain.init)(jax.random.PRNGKey(0), xi)

    for batch in (8, 1):
        x0 = jnp.asarray(
            rng.random((batch, args.size, args.size, 1)).astype(np.float32)
        )
        if dtype is not None:
            x0 = x0.astype(dtype)
        for label, m in (("plain", plain), ("s2d", s2dm)):
            log(f"[b{batch} {label}]")
            ms = time_forward(m, variables, x0, jnp, jax)
            results[f"fwd_b{batch}_{label}_ms"] = round(ms, 2)
            log(f"  {ms:.2f} ms/fwd")
        results[f"fwd_b{batch}_speedup"] = round(
            results[f"fwd_b{batch}_plain_ms"] / results[f"fwd_b{batch}_s2d_ms"], 3
        )

    if not args.skip_endpoint:
        # all-4 endpoint device work (b1, the request shape) through the
        # real engine: sum of per-path latencies with the gated defaults
        from midd_tpu.serve.engine import EngineConfig, InferenceEngine

        ck = "bench_ckpts" if os.path.isdir("bench_ckpts/nafnet") else "/nonexistent"
        for label, s2d_flag in (("plain", False), ("s2d", True)):
            eng = InferenceEngine(EngineConfig(
                img_size=args.size, ckpt_dir=ck, warmup=True,
                nafnet_s2d=s2d_flag,
            ))
            xs = [
                jnp.asarray(rng.random((1, args.size, args.size, 1)
                                       ).astype(np.float32))
                for _ in range(4)
            ]
            names = ("diffusion", "nafnet", "expert", "hybrid")

            def all4(x):
                # the request pattern (engine.process_all per-path mode):
                # enqueue all four programs async, then materialise — the
                # tunnel round-trip is paid once, not per path
                outs = [eng.fns[n](x) for n in names]
                return sum(float(jnp.sum(o)) for o in outs)

            all4(xs[-1])  # warm
            best = float("inf")
            for i in range(N_PASSES):
                t = time.time()
                all4(xs[i % 3])
                best = min(best, time.time() - t)
            results[f"endpoint_{label}_ms"] = round(best * 1e3, 1)
            log(f"endpoint {label}: {results[f'endpoint_{label}_ms']} ms")
            del eng
        results["endpoint_speedup"] = round(
            results["endpoint_plain_ms"] / results["endpoint_s2d_ms"], 3
        )

    with open(args.json_out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
