"""The round-3 gated serving defaults: auto-resolution rules and the
mixed-precision eval paths (see EngineConfig docstrings + PARITY.md for
the ground-truth gates behind each default)."""

import io

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from midd_tpu import config
from midd_tpu.serve.codec import decode_to_tensor
from midd_tpu.serve.engine import EngineConfig, InferenceEngine

TINY = dict(
    img_size=16,
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
    ckpt_dir="/nonexistent",
    warmup=False,
)


def test_auto_schedule_resolution_at_8_steps():
    eng = InferenceEngine(
        EngineConfig(diffusion_steps=8, hybrid_diffusion_steps=8, **TINY)
    )
    assert eng.diffusion_eps_reuse == (0, 2, 6, 7)
    assert eng.hybrid_eps_reuse == (0, 2, 6, 7)


def test_auto_schedule_resolution_other_steps_stays_exact():
    eng = InferenceEngine(
        EngineConfig(
            diffusion_steps=2, hybrid_diffusion_steps=2,
            schedule_cfg=config.ScheduleConfig(noise_steps=6), **TINY,
        )
    )
    # index schedules are 9-step-rollout-specific: standalone falls back to
    # exact, the hybrid to its legacy gated k=2
    assert eng.diffusion_eps_reuse == 1
    assert eng.hybrid_eps_reuse == 2


def test_explicit_settings_override_auto():
    eng = InferenceEngine(
        EngineConfig(
            diffusion_steps=8, hybrid_diffusion_steps=8,
            turbo_eps_reuse=1, hybrid_turbo_eps_reuse=(0, 7), **TINY,
        )
    )
    assert eng.diffusion_eps_reuse == 1
    assert eng.hybrid_eps_reuse == (0, 7)


def test_bf16_eval_paths_stay_close_to_exact():
    """The mixed-precision defaults change numerics only at bf16 scale —
    outputs must stay close to the all-fp32 exact engine (the quality-level
    assertion lives in the TPU ground-truth gates; this pins the plumbing:
    same weights, same schedule, only eval precision differs)."""
    kw = dict(
        diffusion_steps=2, hybrid_diffusion_steps=2,
        schedule_cfg=config.ScheduleConfig(noise_steps=6),
        turbo_eps_reuse=1, hybrid_turbo_eps_reuse=1, **TINY,
    )
    exact = InferenceEngine(
        EngineConfig(diffusion_eval_bf16=False, hybrid_rollout_bf16=False, **kw)
    )
    mixed = InferenceEngine(
        EngineConfig(diffusion_eval_bf16=True, hybrid_rollout_bf16=True, **kw)
    )
    x = jnp.asarray(
        np.clip(np.random.default_rng(3).random((1, 16, 16, 1)), 0, 1)
        .astype(np.float32)
    )
    for name in ("diffusion", "hybrid"):
        a = np.asarray(exact.fns[name](x))
        b = np.asarray(mixed.fns[name](x))
        assert np.max(np.abs(a - b)) < 0.05, name
        assert not np.allclose(a, b, atol=1e-7), f"{name}: bf16 path inert?"


def test_exact_flag_serves_reference_exact_mode():
    """--exact semantics at the EngineConfig level: everything pinned off."""
    eng = InferenceEngine(
        EngineConfig(
            diffusion_steps=8, hybrid_diffusion_steps=8,
            turbo_eps_reuse=1, hybrid_turbo_eps_reuse=1,
            diffusion_eval_bf16=False, hybrid_rollout_bf16=False, **TINY,
        )
    )
    assert eng.diffusion_eps_reuse == 1 and eng.hybrid_eps_reuse == 1
    buf = io.BytesIO()
    Image.fromarray(
        (np.random.default_rng(0).random((16, 16)) * 255).astype("uint8")
    ).save(buf, format="PNG")
    x, orig = decode_to_tensor(buf.getvalue(), 16)
    out = eng.process_all(x, orig)
    assert all(out[n] is not None for n in ("diffusion", "nafnet", "expert", "hybrid"))
