"""Full-endpoint serving load test (VERDICT round-1 item 10 re-measurement).

Launches the stdlib HTTP server in-process (micro-batching engine, all four
model paths — the reference contract, run.py:174-226), then drives it with N
concurrent clients each issuing M sequential ``POST /denoise`` requests with
DISTINCT image payloads (CLAUDE.md timing rules: identical buffers can be
memoised), and reports p50/p95/p99 latency and sustained request throughput.

Run (TPU; warm .xla_cache makes startup minutes, cold ~19 min at 512²):
    python examples/serving_load_test.py --img-size 512 --clients 8 --per-client 6
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_png(seed: int, size: int) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    # X-ray-like: smooth anatomy + noise, same family as the bench phantoms.
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = 0.55 + 0.3 * np.sin(6.0 * (xx + rng.random())) * np.cos(
        5.0 * (yy + rng.random())
    )
    img = np.clip(img + rng.normal(0, 0.08, img.shape), 0, 1)
    buf = io.BytesIO()
    Image.fromarray((img * 255).astype(np.uint8), "L").save(buf, format="PNG")
    return buf.getvalue()


def post_denoise(port: int, png: bytes, timeout: float = 600.0) -> float:
    boundary = "loadtestboundary"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; filename="x.png"\r\n'
        "Content-Type: image/png\r\n\r\n"
    ).encode() + png + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/denoise",
        data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        out = json.loads(resp.read())
    dt = time.time() - t0
    assert all(out.get(k) for k in ("diffusion", "nafnet", "expert", "hybrid")), (
        "a model path returned null"
    )
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--per-client", type=int, default=6)
    ap.add_argument("--port", type=int, default=8719)
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--out", default=None, help="write JSON results here")
    ap.add_argument("--batching", action="store_true",
                    help="micro-batching queue (the round-1 measured config)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--buckets", default=None,
                    help="comma-separated batch buckets, e.g. 1,2,4")
    ap.add_argument("--no-fused", action="store_true",
                    help="disable the fused single-program request path")
    ap.add_argument("--adaptive", action="store_true",
                    help="queue-pressure turbo escalation (gated tiers, "
                         "EngineConfig.adaptive_turbo)")
    ap.add_argument("--queue-depth", type=int, default=3,
                    help="escalation threshold (adaptive_queue_depth)")
    ap.add_argument("--max-queue", type=int, default=None,
                    help="bounded admission: reject (503) beyond this depth")
    args = ap.parse_args()

    from midd_tpu.serve.server import EngineConfig, make_server

    kw = {}
    if args.bf16:
        import jax.numpy as jnp

        kw["compute_dtype"] = jnp.bfloat16
    if args.buckets:
        kw["batch_buckets"] = tuple(int(b) for b in args.buckets.split(","))
    if args.no_fused:
        kw["fused_request"] = False
    if args.adaptive:
        kw["adaptive_turbo"] = True
        kw["adaptive_queue_depth"] = args.queue_depth
    if args.max_queue is not None:
        kw["max_queue_depth"] = args.max_queue
    cfg = EngineConfig(
        img_size=args.img_size,
        ckpt_dir=args.ckpt_dir,
        batching=args.batching,
        **kw,
    )
    t0 = time.time()
    server = make_server("127.0.0.1", args.port, engine_config=cfg)
    buckets = server.RequestHandlerClass.engine.batcher.buckets if args.batching else None
    log(f"engine warm in {time.time() - t0:.1f}s (buckets {buckets})")
    threading.Thread(target=server.serve_forever, daemon=True).start()

    # Sequential baseline (p50 of 5 solo requests).
    solo = [
        post_denoise(args.port, make_png(1000 + i, args.img_size)) for i in range(5)
    ]
    log(f"solo request p50 {np.median(solo) * 1e3:.0f} ms")

    lat: list[float] = []
    errors: list[str] = []
    lock = threading.Lock()

    def client(cid: int):
        for j in range(args.per_client):
            try:
                dt = post_denoise(
                    args.port, make_png(cid * 997 + j, args.img_size)
                )
            except Exception as e:  # noqa: BLE001
                # record and continue: a silent thread death would shrink the
                # sample set and corrupt the reported stats
                with lock:
                    errors.append(f"client {cid} req {j}: {e}")
                continue
            with lock:
                lat.append(dt)

    threads = [
        threading.Thread(target=client, args=(c,)) for c in range(args.clients)
    ]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    n = len(lat)
    if not n:
        print(json.dumps({"error": "all requests failed", "errors": errors[:5]}))
        sys.exit(1)
    result = {
        "errors": len(errors),
        "img_size": args.img_size,
        "clients": args.clients,
        "requests": n,
        "solo_p50_ms": round(float(np.median(solo)) * 1e3, 1),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 1),
        "req_per_s": round(n / wall, 3),
        "batch_buckets": buckets,
    }
    if args.batching:
        result["batcher_stats"] = (
            server.RequestHandlerClass.engine.batcher.stats
        )
    if args.adaptive:
        result["adaptive"] = {"queue_depth": args.queue_depth}
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    server.shutdown()


if __name__ == "__main__":
    main()
