"""Micro-batching queue tests: concurrent requests coalesce into one padded
device call; per-model failures isolate to null."""

import threading

import numpy as np

import jax.numpy as jnp

from midd_tpu.serve.batching import MicroBatcher


def test_batcher_coalesces_concurrent_requests():
    calls = []

    def fn(x):
        calls.append(int(x.shape[0]))
        return x * 2.0

    batcher = MicroBatcher({"m": fn}, buckets=(1, 2, 4), max_wait_ms=50)
    xs = [np.full((1, 4, 4, 1), i, np.float32) for i in range(4)]
    futs = [batcher.submit(x) for x in xs]
    outs = [f.result(timeout=30) for f in futs]
    batcher.stop()

    for i, out in enumerate(outs):
        np.testing.assert_allclose(out["m"], xs[i] * 2.0)
    # fewer device calls than requests (some coalescing happened)
    assert batcher.stats["requests"] == 4
    assert batcher.stats["batches"] <= 3
    # every executed batch used a bucket shape
    assert all(c in (1, 2, 4) for c in calls)


def test_batcher_pads_to_bucket():
    shapes = []

    def fn(x):
        shapes.append(int(x.shape[0]))
        return x

    batcher = MicroBatcher({"m": fn}, buckets=(4,), max_wait_ms=1)
    out = batcher.process(np.ones((1, 2, 2, 1), np.float32))
    batcher.stop()
    assert shapes == [4]  # padded 1 -> 4
    assert out["m"].shape == (1, 2, 2, 1)


def test_batcher_isolates_model_failure():
    def good(x):
        return x + 1

    def bad(x):
        raise RuntimeError("boom")

    batcher = MicroBatcher({"good": good, "bad": bad}, buckets=(1,), max_wait_ms=1)
    out = batcher.process(np.zeros((1, 2, 2, 1), np.float32))
    batcher.stop()
    assert out["bad"] is None
    np.testing.assert_allclose(out["good"], np.ones((1, 2, 2, 1)))


def test_auto_buckets_by_image_size():
    """batch_buckets="auto" must resolve from the measured policy: deep
    buckets at <=256² (batch-8 rollouts ~4.4x cheaper/img), bucket 1 at 512²
    (chip saturates at batch 1; every coalescing level measured worse —
    examples/serving_load_test.py results in EngineConfig docstring)."""
    from midd_tpu import config as c
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    kw = dict(
        diffusion_steps=2,
        hybrid_diffusion_steps=2,
        nafnet_cfg=c.NAFNetConfig(width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)),
        diffusion_cfg=c.DiffusionUNetConfig(model_channels=8, channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(1,), time_emb_dim=16),
        expert_cfg=c.ExpertConfig(base_channels=8),
        router_cfg=c.RouterConfig(base_c=8),
        fusion_cfg=c.FusionConfig(base_c=16),
        schedule_cfg=c.ScheduleConfig(noise_steps=6),
        ckpt_dir="/nonexistent",
        warmup=False,
        batching=True,
    )
    small = InferenceEngine(EngineConfig(img_size=16, **kw))
    assert small.batcher.buckets == [1, 2, 4, 8]
    small.batcher.stop()
    big = InferenceEngine(EngineConfig(img_size=512, **kw))
    assert big.batcher.buckets == [1]
    big.batcher.stop()
    # explicit tuples are honored verbatim
    expl = InferenceEngine(EngineConfig(img_size=512, **{**kw, "batch_buckets": (1, 2)}))
    assert expl.batcher.buckets == [1, 2]
    expl.batcher.stop()


def test_dp_batching_rounds_buckets_to_dp_multiples():
    """data_parallel + batching: buckets must be dp-multiples (a batch-1
    program cannot shard its batch axis 8 ways) — auto buckets round up and
    the padded batcher path serves a single request correctly."""
    from midd_tpu import config as c
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    eng = InferenceEngine(
        EngineConfig(
            img_size=16,
            diffusion_steps=2,
            hybrid_diffusion_steps=2,
            nafnet_cfg=c.NAFNetConfig(width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)),
            diffusion_cfg=c.DiffusionUNetConfig(model_channels=8, channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(1,), time_emb_dim=16),
            expert_cfg=c.ExpertConfig(base_channels=8),
            router_cfg=c.RouterConfig(base_c=8),
            fusion_cfg=c.FusionConfig(base_c=16),
            schedule_cfg=c.ScheduleConfig(noise_steps=6),
            ckpt_dir="/nonexistent",
            warmup=False,
            batching=True,
            data_parallel=True,
        )
    )
    dp = eng.mesh.shape["dp"]
    assert dp > 1
    assert all(b % dp == 0 for b in eng.batcher.buckets), eng.batcher.buckets
    x = np.random.default_rng(0).random((1, 16, 16, 1)).astype(np.float32)
    outs = eng.batcher.process(x)
    for name in ("diffusion", "nafnet", "expert", "hybrid"):
        assert outs[name].shape == (1, 16, 16, 1)
        assert np.isfinite(outs[name]).all()
    eng.batcher.stop()


def test_adaptive_turbo_escalates_under_queue_pressure():
    """turbo_fns run instead of the exact paths when the queue depth at
    dispatch time reaches turbo_queue_depth — and results reflect it."""
    import time

    calls = {"exact": 0, "turbo": 0}

    def exact(x):
        calls["exact"] += 1
        time.sleep(0.05)  # slow device: lets the queue build
        return jnp.asarray(x) + 1.0

    def turbo(x):
        calls["turbo"] += 1
        return jnp.asarray(x) + 2.0

    mb = MicroBatcher(
        {"m": exact}, buckets=(1,), max_wait_ms=0.0,
        turbo_fns={"m": turbo}, turbo_queue_depth=2,
    )
    try:
        xs = [np.full((1, 4, 4, 1), i, np.float32) for i in range(8)]
        futs = [mb.submit(x) for x in xs]
        outs = [f.result(timeout=30) for f in futs]
        # early requests (shallow queue) ran exact; the backlog escalated
        assert calls["turbo"] > 0 and calls["exact"] > 0
        assert mb.stats["turbo_batches"] > 0
        deltas = {float(o["m"][0, 0, 0, 0] - x[0, 0, 0, 0])
                  for o, x in zip(outs, xs)}
        assert deltas == {1.0, 2.0}  # both tiers actually served requests
    finally:
        mb.stop()


def test_bounded_admission_rejects_when_full():
    import time

    from midd_tpu.serve.batching import QueueFull

    def slow(x):
        time.sleep(0.1)
        return jnp.asarray(x)

    mb = MicroBatcher(
        {"m": slow}, buckets=(1,), max_wait_ms=0.0, max_queue_depth=2,
    )
    try:
        rejected = 0
        futs = []
        for i in range(12):
            try:
                futs.append(mb.submit(np.zeros((1, 4, 4, 1), np.float32)))
            except QueueFull:
                rejected += 1
        assert rejected > 0
        assert mb.stats["rejected"] == rejected
        for f in futs:
            assert f.result(timeout=30)["m"] is not None
    finally:
        mb.stop()
