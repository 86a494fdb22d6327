"""Fused single-program /denoise requests (shared-subgraph serving).

When the hybrid checkpoint carries only router+fusion (trainer-saved), the
engine's hybrid path already reuses the standalone backends' weights; the
fused program additionally computes the shared NAFNet forward / diffusion
rollout ONCE. These tests pin the contract: fused outputs must equal the
per-path programs exactly, in every sharing regime."""

import numpy as np
import pytest

import jax.numpy as jnp

from midd_tpu import config
from midd_tpu.serve.engine import EngineConfig, InferenceEngine

TINY = dict(
    img_size=16,
    diffusion_steps=2,
    hybrid_diffusion_steps=2,
    nafnet_cfg=config.NAFNetConfig(
        width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)
    ),
    diffusion_cfg=config.DiffusionUNetConfig(
        model_channels=8, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(1,), time_emb_dim=16,
    ),
    expert_cfg=config.ExpertConfig(base_channels=8),
    router_cfg=config.RouterConfig(base_c=8),
    fusion_cfg=config.FusionConfig(base_c=16),
    schedule_cfg=config.ScheduleConfig(noise_steps=6),
    warmup=False,
)


@pytest.fixture(scope="module")
def hybrid_ckpt_dir(tmp_path_factory):
    """Trainer-saved hybrid checkpoint (router+fusion only -> the engine
    falls back to the standalone backends = the sharing regime)."""
    from midd_tpu.train import data
    from midd_tpu.train.recipes import train_hybrid
    from midd_tpu.train.trainer import TrainConfig

    tmp = tmp_path_factory.mktemp("fused_ckpts")
    rng = np.random.default_rng(0)
    clean = rng.random((4, 16, 16, 1)).astype(np.float32)
    ds = data.SyntheticPairedDataset(clean, is_train=False)
    train_hybrid(
        ds,
        nafnet_ckpt=None,
        diffusion_ckpt=None,
        hybrid_cfg=config.HybridConfig(
            nafnet=TINY["nafnet_cfg"], diffusion=TINY["diffusion_cfg"],
            schedule=TINY["schedule_cfg"],
            router=TINY["router_cfg"], fusion=TINY["fusion_cfg"],
            training_diffusion_steps=2, inference_diffusion_steps=2,
        ),
        train_cfg=TrainConfig(epochs=1, batch_size=2, lr=1e-3,
                              ckpt_dir=str(tmp), ckpt_name="hybrid",
                              num_workers=0, prefetch=0),
    )
    return str(tmp)


def _x(batch=2):
    rng = np.random.default_rng(7)
    return jnp.asarray(
        np.clip(rng.random((batch, 16, 16, 1), dtype=np.float32), 0, 1)
    )


def _assert_fused_matches(engine):
    x = _x()
    fused = engine.fused(x)
    for name in ("diffusion", "nafnet", "expert", "hybrid"):
        per_path = np.asarray(engine.fns[name](x))
        np.testing.assert_allclose(
            np.asarray(fused[name]), per_path, atol=1e-6, err_msg=name
        )


def test_fused_shared_backends_full_sharing(hybrid_ckpt_dir):
    """Same steps + same eps_reuse: both the NAFNet forward and the rollout
    are shared; outputs must be identical to the per-path programs."""
    eng = InferenceEngine(
        EngineConfig(
            ckpt_dir=hybrid_ckpt_dir, fused_request=True, turbo_eps_reuse=1,
            hybrid_turbo_eps_reuse=1, **TINY,
        )
    )
    assert eng.fused is not None
    assert eng.shares == {"backends": True, "rollout": True}
    _assert_fused_matches(eng)


def test_hybrid_turbo_auto_matches_shared_rollout(hybrid_ckpt_dir):
    """hybrid_turbo_eps_reuse=None (auto): when fused sharing fires, the
    hybrid must ride the standalone EXACT rollout (faster than k=2 AND
    higher quality — the rollout is computed anyway); per-path serving
    (the measured default) keeps the gated k=2."""
    eng = InferenceEngine(
        EngineConfig(ckpt_dir=hybrid_ckpt_dir, fused_request=True, **TINY)
    )
    assert eng.hybrid_eps_reuse == 1
    assert eng.shares == {"backends": True, "rollout": True}
    _assert_fused_matches(eng)
    demo = InferenceEngine(EngineConfig(ckpt_dir="/nonexistent", **TINY))
    assert demo.hybrid_eps_reuse == 2
    perpath = InferenceEngine(EngineConfig(ckpt_dir=hybrid_ckpt_dir, **TINY))
    assert perpath.fused is None and perpath.hybrid_eps_reuse == 2


def test_fused_partial_sharing_turbo_mismatch(hybrid_ckpt_dir):
    """Standalone exact vs hybrid eps_reuse=2: rollouts differ, only the
    NAFNet forward is shared — fused must still match per-path exactly."""
    eng = InferenceEngine(
        EngineConfig(
            ckpt_dir=hybrid_ckpt_dir, fused_request=True, turbo_eps_reuse=1,
            hybrid_turbo_eps_reuse=2, **TINY,
        )
    )
    assert eng.fused is not None
    assert eng.shares == {"backends": True, "rollout": False}
    _assert_fused_matches(eng)


def test_fused_forced_on_demo_weights():
    """Demo mode: hybrid has its OWN random backends (no sharing). Forcing
    fused_request=True must still reproduce the per-path outputs."""
    eng = InferenceEngine(
        EngineConfig(ckpt_dir="/nonexistent", fused_request=True, **TINY)
    )
    assert eng.fused is not None
    assert eng.shares["backends"] is False
    _assert_fused_matches(eng)


def test_fused_off_by_default():
    eng = InferenceEngine(EngineConfig(ckpt_dir="/nonexistent", **TINY))
    assert eng.fused is None


def test_fused_through_batcher(hybrid_ckpt_dir):
    """The micro-batcher's fused dispatch returns the same per-request
    outputs as the per-path programs."""
    eng = InferenceEngine(
        EngineConfig(ckpt_dir=hybrid_ckpt_dir, batching=True, fused_request=True, **TINY)
    )
    assert eng.batcher is not None and eng.batcher.fused_fn is not None
    x = np.asarray(_x(1))
    outs = eng.batcher.process(x)
    for name in ("diffusion", "nafnet", "expert", "hybrid"):
        per_path = np.asarray(eng.fns[name](jnp.asarray(x)))
        np.testing.assert_allclose(outs[name], per_path, atol=1e-6, err_msg=name)
    eng.batcher.stop()


def test_hybrid_turbo_auto_never_inherits_ungated_k(hybrid_ckpt_dir):
    """Auto hk must not ride an UNGATED standalone eps_reuse > 2 into the
    hybrid: with --turbo 4 + fused, hk stays at the gated 2 and the rollout
    is NOT shared."""
    eng = InferenceEngine(
        EngineConfig(
            ckpt_dir=hybrid_ckpt_dir, fused_request=True,
            turbo_eps_reuse=4, **TINY,
        )
    )
    assert eng.hybrid_eps_reuse == 2
    assert eng.shares["rollout"] is False
    _assert_fused_matches(eng)
