"""1024² operating-point contract (SURVEY §5 long-context row): the engine
must build, bucket, and serve 1024x1024 requests end-to-end — the axis the
flash kernel's block parameters exist to keep feasible (n=16384 spatial
attention; kernel equivalence at that length is proven in
test_flash_attention.py::test_flash_longcontext_n16384)."""

import numpy as np

import jax.numpy as jnp

from midd_tpu import config
from midd_tpu.serve.engine import MODEL_NAMES, EngineConfig, InferenceEngine

TINY_1024 = dict(
    img_size=1024,
    diffusion_steps=1,
    hybrid_diffusion_steps=1,
    nafnet_cfg=config.NAFNetConfig(
        width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)
    ),
    # the REAL serving topology (4 resolutions, attention at index 3) at
    # tiny width: at 1024² the attention map is 128x128 -> n=16384, the
    # long-context shape itself. The XLA attention path would materialise a
    # 16384² logits matrix per head; the flash kernel (interpret mode on
    # CPU, same code Mosaic compiles on TPU) is what makes this feasible —
    # which is exactly the claim under test.
    diffusion_cfg=config.DiffusionUNetConfig(
        model_channels=8,
        channel_mult=(1, 2, 3, 4),
        num_res_blocks=1,
        attention_resolutions=(3,),
        time_emb_dim=16,
    ),
    use_flash_attention=True,
    expert_cfg=config.ExpertConfig(base_channels=8),
    router_cfg=config.RouterConfig(base_c=8),
    fusion_cfg=config.FusionConfig(base_c=16),
    schedule_cfg=config.ScheduleConfig(noise_steps=6),
    ckpt_dir="/nonexistent",  # demo weights
    warmup=False,
)


def test_engine_1024_end_to_end():
    """One 1024² request flows through all four model paths: correct output
    shape, finite, clamped — the capability was previously only a claim."""
    eng = InferenceEngine(EngineConfig(**TINY_1024))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 1024, 1024, 1), dtype=np.float32))
    for name in MODEL_NAMES:
        out = np.asarray(eng.fns[name](x))
        assert out.shape == (1, 1024, 1024, 1), name
        assert np.isfinite(out).all(), name
        assert out.min() >= 0.0 and out.max() <= 1.0, name


def test_auto_buckets_at_1024():
    """batch_buckets='auto' resolves to (1,) at 1024² — the chip saturates
    at batch 1 from 512² up (measured, EngineConfig.batch_buckets)."""
    eng = InferenceEngine(EngineConfig(**TINY_1024, batching=True))
    assert eng.batcher is not None
    assert tuple(eng.batcher.buckets) == (1,)
    eng.batcher.stop()
