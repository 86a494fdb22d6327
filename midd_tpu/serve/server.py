"""Standalone HTTP serving shell (stdlib; no FastAPI dependency).

Byte-compatible contract with the reference FastAPI service (run.py:174-226):

- ``GET /``        -> {"message", "status", "endpoints"}
- ``GET /health``  -> {"status", "device", "models_loaded": {4 bools}}
- ``POST /denoise`` multipart/form-data with a ``file`` field ->
  {"diffusion","nafnet","expert","hybrid"}: base64 PNG or null per failed
  path; HTTP 500 {"detail": ...} on request-level errors.

A thread pool serves connections; the four model programs per request are
dispatched asynchronously to the device by the engine. An optional FastAPI
app factory with the identical contract lives in midd_tpu.serve.app for
environments that have fastapi installed.
"""

from __future__ import annotations

import email.parser
import email.policy
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from midd_tpu.serve.batching import QueueFull
from midd_tpu.serve.codec import decode_to_tensor
from midd_tpu.serve.engine import EngineConfig, InferenceEngine


def parse_multipart_file(body: bytes, content_type: str) -> Optional[bytes]:
    """Extract the first file field from a multipart/form-data body."""
    parser = email.parser.BytesParser(policy=email.policy.HTTP)
    msg = parser.parsebytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body
    )
    if not msg.is_multipart():
        return None
    for part in msg.iter_parts():
        disp = part.get("Content-Disposition", "")
        if "form-data" in disp:
            return part.get_payload(decode=True)
    return None


class _Handler(BaseHTTPRequestHandler):
    engine: InferenceEngine  # set by make_server
    img_size: int = 512

    def _json(self, obj, status: int = 200):
        data = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.send_header("Access-Control-Allow-Origin", "*")  # CORS-allow-all (run.py:166-172)
        self.end_headers()
        self.wfile.write(data)

    def _html(self, html: str, status: int = 200):
        data = html.encode()
        self.send_response(status)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):  # noqa: N802
        if self.path == "/ui":
            from midd_tpu.serve.static_ui import UI_HTML

            self._html(UI_HTML)
        elif self.path == "/":
            self._json(
                {
                    "message": "X-Ray Denoising API with Hybrid Routing",
                    "status": "running",
                    "endpoints": {"denoise": "/denoise", "health": "/health"},
                }
            )
        elif self.path == "/health":
            self._json(self.engine.health())
        else:
            self._json({"detail": "Not Found"}, 404)

    def do_POST(self):  # noqa: N802
        if self.path != "/denoise":
            self._json({"detail": "Not Found"}, 404)
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            if ctype.startswith("multipart/form-data"):
                file_bytes = parse_multipart_file(body, ctype)
            else:
                file_bytes = body  # raw image body also accepted
            if not file_bytes:
                raise ValueError("no file field in request")
            x, original_size = decode_to_tensor(file_bytes, self.img_size)
            results = self.engine.process_all(x, original_size)
            self._json(results)
        except QueueFull as e:
            # bounded admission (EngineConfig.max_queue_depth): shed load
            # with an explicit retryable status instead of unbounded latency
            self.send_response(503)
            self.send_header("Retry-After", "1")
            data = json.dumps({"detail": str(e)}).encode()
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
        except Exception as e:  # noqa: BLE001  (run.py:210-213)
            import traceback

            traceback.print_exc()
            self._json({"detail": str(e)}, 500)

    def log_message(self, fmt, *args):  # quieter default logging
        pass


def make_server(
    host: str = "0.0.0.0",
    port: int = 8000,
    engine: Optional[InferenceEngine] = None,
    engine_config: Optional[EngineConfig] = None,
) -> ThreadingHTTPServer:
    engine = engine or InferenceEngine(engine_config or EngineConfig())

    class Handler(_Handler):
        pass

    Handler.engine = engine
    Handler.img_size = engine.cfg.img_size
    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(host="0.0.0.0", port=8000, engine_config=None):
    server = make_server(host, port, engine_config=engine_config)
    # startup banner states the active quality mode so deployments are
    # auditable from the logs as well as from GET /health
    mode = server.RequestHandlerClass.engine.serving_mode()
    print(f"serving on http://{host}:{port}")
    print(f"serving mode: {json.dumps(mode)}")
    server.serve_forever()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--turbo", default="auto",
                    help="STANDALONE diffusion rollout eps setting: 'auto' "
                         "(default: the twice-gated {0,2,6,7} schedule at the "
                         "8-step serving count, exact otherwise), an int k "
                         "(uniform reuse stride; 1 = exact reference "
                         "rollout) or a comma list of refresh indices — "
                         "gate per deployment (xray_bench --turbo-gate, "
                         "ROADMAP.md)")
    ap.add_argument("--turbo-hybrid", default=None,
                    help="hybrid-path eps setting (int k or comma indices). "
                         "Default auto: the fused shared rollout when "
                         "available; else the studied '0,2,6,7' schedule at "
                         "8 steps (quality-free-to-positive on both gated "
                         "hybrid profiles); else k=2")
    ap.add_argument("--int8", action="store_true",
                    help="static-calibrated int8 convs in the diffusion UNets "
                         "(opt-in; quality-gated on xraybench — PARITY.md)")
    ap.add_argument("--dp", action="store_true",
                    help="data-parallel serving: batch sharded over devices")
    ap.add_argument("--tp", action="store_true",
                    help="tensor-parallel serving: large conv kernels sharded "
                         "over devices (output channels)")
    ap.add_argument("--sp", type=int, default=0, metavar="N",
                    help="spatial-parallel serving: image rows sharded over N "
                         "devices (batch-1 latency; 0 = off, -1 = auto)")
    ap.add_argument("--fused", action="store_true",
                    help="fused single-program requests (shared subgraphs + "
                         "1 dispatch; measured net-negative on v5e-lite at "
                         "512² — see EngineConfig.fused_request)")
    ap.add_argument("--batching", action="store_true",
                    help="micro-batching queue: coalesce concurrent requests "
                         "into size-bucketed device batches (2.5x measured "
                         "req/s at 512² under 8 clients vs per-thread dispatch)")
    ap.add_argument("--buckets", default=None, metavar="B1,B2,...",
                    help="explicit batch buckets (default: auto by image size "
                         "— (1,2,4,8) at <=256², (1,) at 512²; measured, see "
                         "EngineConfig.batch_buckets)")
    ap.add_argument("--adaptive", action="store_true",
                    help="load-adaptive turbo: when the request queue reaches "
                         "--queue-depth, the rollout paths switch to their "
                         "quality-gated turbo programs (requires --batching)")
    ap.add_argument("--queue-depth", type=int, default=3,
                    help="adaptive escalation threshold")
    ap.add_argument("--max-queue", type=int, default=None,
                    help="bounded admission: 503 beyond this many waiting "
                         "requests (requires --batching)")
    ap.add_argument("--exact", action="store_true",
                    help="reference-exact serving: pins every gated default "
                         "off (exact fp32 rollouts on both paths, fp32 UNet "
                         "evals) — the numerics-parity mode")
    ap.add_argument("--aot", default=None, metavar="DIR",
                    help="AOT executable pinning dir: serialize serving "
                         "executables at first start, load on later starts "
                         "(single-device engines; see EngineConfig.aot_dir)")
    args = ap.parse_args()

    def _parse_eps(v):
        if v is None or v == "auto":
            return v
        s = str(v)
        return tuple(int(i) for i in s.split(",")) if "," in s else int(s)

    import jax.numpy as jnp

    cfg = EngineConfig(
        img_size=args.img_size,
        ckpt_dir=args.ckpt_dir,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        turbo_eps_reuse=1 if args.exact else _parse_eps(args.turbo),
        hybrid_turbo_eps_reuse=1 if args.exact else _parse_eps(args.turbo_hybrid),
        diffusion_eval_bf16=not args.exact,
        hybrid_rollout_bf16=not args.exact,
        quantize_int8="static" if args.int8 else False,
        batching=args.batching,
        fused_request=args.fused or None,
        batch_buckets=(
            tuple(int(b) for b in args.buckets.split(",")) if args.buckets
            else "auto"
        ),
        data_parallel=args.dp,
        tensor_parallel=args.tp,
        spatial_parallel=args.sp != 0,
        sp_size=args.sp if args.sp > 0 else None,
        adaptive_turbo=args.adaptive,
        adaptive_queue_depth=args.queue_depth,
        max_queue_depth=args.max_queue,
        aot_dir=args.aot,
    )
    serve_forever(args.host, args.port, engine_config=cfg)
