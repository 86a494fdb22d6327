"""1024² operating point on real TPU (round-3 verdict item 2): tune the
flash-attention blocks at n=16384, then run 1024² single-image requests
end-to-end through the engine.

Parts:
1. block sweep: standalone flash attention at the 1024²-image shape
   (n = 128x128 = 16384 tokens, 2 heads, d=96, bf16) over block_q/block_k;
2. engine: all-4 single-image device work + per-path latency at 1024²
   (serving defaults; weights from bench_ckpts when present, demo otherwise);
3. (separate) the load row comes from examples/serving_load_test.py
   --img-size 1024.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u examples/longcontext_1024_bench.py
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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip-sweep", action="store_true")
    ap.add_argument("--skip-engine", action="store_true")
    ap.add_argument("--json-out", default="longcontext_1024.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from midd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    log(f"device: {dev}")
    results = {}

    if not args.skip_sweep:
        from midd_tpu.ops.flash_attention import mha_flash

        n, h, d = 16384, 2, 96
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((1, n, h, d)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((1, n, h, d)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((1, n, h, d)).astype(np.float32)
                        ).astype(jnp.bfloat16)

        sweep = {}
        for bq, bk in ((512, 512), (1024, 1024), (2048, 1024), (1024, 2048),
                       (2048, 2048), (4096, 2048)):
            def scan_attn(q, k, v, bq=bq, bk=bk):
                def step(c, _):
                    o = mha_flash(c, k, v, block_q=bq, block_k=bk)
                    return o.astype(c.dtype), None

                return jax.lax.scan(step, q, None, length=N_SCAN)[0]

            f = jax.jit(scan_attn)
            try:
                t = time.time()
                float(jnp.sum(f(q, k, v).astype(jnp.float32)))
                log(f"blocks ({bq},{bk}): compile {time.time() - t:.1f}s")
                best = float("inf")
                for i in range(N_PASSES):
                    qi = (q + jnp.asarray((i + 1) * 1e-3, q.dtype)).astype(q.dtype)
                    t = time.time()
                    float(jnp.sum(f(qi, k, v).astype(jnp.float32)))
                    best = min(best, (time.time() - t) / N_SCAN)
                sweep[f"{bq}x{bk}"] = round(best * 1e3, 3)
                log(f"blocks ({bq},{bk}): {best * 1e3:.3f} ms")
            except Exception as e:  # noqa: BLE001 — VMEM OOM cells are data
                sweep[f"{bq}x{bk}"] = None
                log(f"blocks ({bq},{bk}): FAILED "
                    f"({'vmem OOM' if 'vmem' in str(e) else str(e)[:120]})")
        ok = {k: v for k, v in sweep.items() if v is not None}
        results["flash_n16384_sweep_ms"] = sweep
        results["flash_n16384_best"] = min(ok, key=ok.get)

    if not args.skip_engine:
        from midd_tpu.serve.engine import EngineConfig, InferenceEngine

        ck = "bench_ckpts" if os.path.isdir("bench_ckpts/nafnet") else "/nonexistent"
        eng = InferenceEngine(EngineConfig(
            img_size=1024, ckpt_dir=ck, warmup=True,
        ))
        rng = np.random.default_rng(1)
        xs = [
            jnp.asarray(rng.random((1, 1024, 1024, 1)).astype(np.float32))
            for _ in range(4)
        ]
        names = ("diffusion", "nafnet", "expert", "hybrid")
        per_path = {}
        for nme in names:
            fn = eng.fns[nme]
            float(jnp.sum(fn(xs[-1])))
            best = float("inf")
            for i in range(N_PASSES):
                t = time.time()
                float(jnp.sum(fn(xs[i % 3])))
                best = min(best, time.time() - t)
            per_path[nme] = round(best * 1e3, 1)
            log(f"1024² {nme}: {per_path[nme]} ms")
        results["engine_1024_per_path_ms"] = per_path

        def all4(x):
            outs = [eng.fns[nme](x) for nme in names]
            return sum(float(jnp.sum(o)) for o in outs)

        all4(xs[-1])
        best = float("inf")
        for i in range(N_PASSES):
            t = time.time()
            all4(xs[i % 3])
            best = min(best, time.time() - t)
        results["engine_1024_all4_ms"] = round(best * 1e3, 1)
        log(f"1024² all-4 request device work: {results['engine_1024_all4_ms']} ms")
        results["serving_mode"] = eng.serving_mode()

    with open(args.json_out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
