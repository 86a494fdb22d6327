"""Optional FastAPI app with the reference's exact contract (run.py:153-242).

FastAPI is not installed in every deployment image; the stdlib server in
midd_tpu.serve.server is the default shell. This factory exists so that
environments with fastapi/uvicorn get the identical ASGI surface (CORS
allow-all, lifespan model load, asyncio 4-way dispatch).
"""

from __future__ import annotations

import asyncio
from typing import Optional

from midd_tpu.serve.codec import decode_to_tensor
from midd_tpu.serve.engine import EngineConfig, InferenceEngine, MODEL_NAMES


def create_app(engine_config: Optional[EngineConfig] = None):
    from contextlib import asynccontextmanager

    from fastapi import FastAPI, File, HTTPException, UploadFile
    from fastapi.middleware.cors import CORSMiddleware
    from fastapi.responses import JSONResponse

    state = {}

    @asynccontextmanager
    async def lifespan(app):
        state["engine"] = InferenceEngine(engine_config or EngineConfig())
        yield

    app = FastAPI(
        title="X-Ray Denoising API",
        description="Multi-model X-ray denoising service with hybrid routing (TPU)",
        version="2.0.0",
        lifespan=lifespan,
    )
    app.add_middleware(
        CORSMiddleware,
        allow_origins=["*"],
        allow_credentials=True,
        allow_methods=["*"],
        allow_headers=["*"],
    )

    @app.get("/")
    async def root():
        return {
            "message": "X-Ray Denoising API with Hybrid Routing",
            "status": "running",
            "endpoints": {"denoise": "/denoise", "health": "/health"},
        }

    @app.post("/denoise")
    async def denoise_xray(file: UploadFile = File(...)):
        try:
            engine: InferenceEngine = state["engine"]
            data = await file.read()
            x, original_size = decode_to_tensor(data, engine.cfg.img_size)
            results = await asyncio.to_thread(engine.process_all, x, original_size)
            return JSONResponse(content=results)
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            raise HTTPException(status_code=500, detail=str(e))

    @app.get("/health")
    async def health_check():
        engine = state.get("engine")
        if engine is None:
            return {
                "status": "starting",
                "device": "unknown",
                "models_loaded": {n: False for n in MODEL_NAMES},
            }
        return engine.health()

    return app


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()
    try:
        import uvicorn

        uvicorn.run(create_app(), host=args.host, port=args.port)
    except ImportError:
        print("fastapi/uvicorn not installed; falling back to stdlib server")
        from midd_tpu.serve.server import serve_forever

        serve_forever(args.host, args.port)
