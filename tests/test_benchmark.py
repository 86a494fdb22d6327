"""Quality-benchmark protocol tests: determinism, scoring sanity, and the
evaluate.py entry point (the one serving-adjacent module round 1 left
untested)."""

import numpy as np

import jax.numpy as jnp

from midd_tpu import config as c
from midd_tpu.benchmarks import (
    PROTOCOL_VERSION,
    make_eval_set,
    make_phantoms,
    score_engine,
    score_fn,
)

TINY_ENGINE_KW = dict(
    img_size=32,
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
)


def test_protocol_is_versioned_and_deterministic():
    assert PROTOCOL_VERSION == "xraybench-v1"
    a = make_eval_set(n_per_noise=2, img_size=32)
    b = make_eval_set(n_per_noise=2, img_size=32)
    assert len(a) == 6  # 2 per noise family x 3 families
    for (ca, na, ta), (cb, nb, tb) in zip(a, b):
        assert ta == tb
        np.testing.assert_array_equal(ca, cb)
        np.testing.assert_array_equal(na, nb)
    # all three noise families present, images in range
    assert {t for _, _, t in a} == {"gaussian", "speckle", "poisson"}
    for clean, noisy, _ in a:
        assert clean.shape == (32, 32, 1) and noisy.shape == (32, 32, 1)
        assert 0.0 <= clean.min() and clean.max() <= 1.0
        assert 0.0 <= noisy.min() and noisy.max() <= 1.0


def test_phantoms_have_structure():
    imgs = make_phantoms(4, 64, seed=1)
    assert imgs.shape == (4, 64, 64, 1)
    # non-trivial contrast (torso vs background) and distinct images
    assert imgs.std() > 0.05
    assert not np.allclose(imgs[0], imgs[1])


def test_score_fn_identity_and_oracle():
    eval_set = make_eval_set(n_per_noise=2, img_size=32)
    ident = score_fn(lambda x: x, eval_set)
    # noisy-input baseline: finite, imperfect
    assert 5.0 < ident["overall"]["psnr"] < 40.0
    assert ident["overall"]["n"] == 6
    # a near-perfect oracle (clean + 1e-3) must massively outscore identity
    # (exactly-clean preds give infinite PSNR, which score_fn drops)
    oracle = score_fn(
        lambda x: jnp.asarray(
            np.clip(
                np.stack([c for c, n, _ in eval_set[: x.shape[0]]]) + 1e-3, 0, 1
            )
        ),
        eval_set,
        batch=len(eval_set),
    )
    assert oracle["overall"]["psnr"] >= 40.0
    assert oracle["overall"]["n"] == 6
    assert oracle["overall"]["psnr"] > ident["overall"]["psnr"]


def test_score_engine_all_paths_demo_weights():
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    engine = InferenceEngine(EngineConfig(**TINY_ENGINE_KW))
    eval_set = make_eval_set(n_per_noise=1, img_size=32)
    results = score_engine(engine, eval_set)
    assert set(results) == {"_input", "diffusion", "nafnet", "expert", "hybrid"}
    for name, r in results.items():
        assert np.isfinite(r["overall"]["psnr"]), name


def test_evaluate_entry_point(tmp_path):
    """midd_tpu.evaluate.evaluate over a tiny paired dataset (engine arch
    overridden through engine_kwargs)."""
    from midd_tpu.evaluate import evaluate

    eval_set = make_eval_set(n_per_noise=1, img_size=32)
    dataset = [(c, n) for c, n, _ in eval_set]
    kw = dict(TINY_ENGINE_KW)
    kw.pop("img_size"), kw.pop("diffusion_steps"), kw.pop("hybrid_diffusion_steps")
    ckpt_dir = kw.pop("ckpt_dir")
    kw.pop("warmup")
    res = evaluate(
        "nafnet",
        dataset,
        ckpt_dir=ckpt_dir,
        img_size=32,
        steps=2,
        engine_kwargs=kw,
    )
    assert res["model"] == "nafnet" and res["n"] == 3
    assert np.isfinite(res["psnr"]) and np.isfinite(res["ssim"])


def test_train_all_tpu_hybrid_profile(tmp_path, monkeypatch):
    """`xray_bench --train --hybrid-profile tpu` writes a hybrid checkpoint
    carrying the adopted flagship arch (residual expert-fed fusion) that the
    scoring engine loads drop-in from metadata."""
    from midd_tpu.benchmarks.xray_bench import train_all
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine
    from midd_tpu.utils.checkpoint import load_checkpoint

    monkeypatch.chdir(tmp_path)
    ckpt_dir = str(tmp_path / "ck")
    train_all(ckpt_dir, img_size=32, n_train=4, epochs_scale=0.01,
              width_preset="tiny", hybrid_profile="tpu")
    tree, meta = load_checkpoint(f"{ckpt_dir}/hybrid")
    assert meta["fusion_params"]["residual"]
    assert meta["fusion_params"]["sees_expert"]
    # the frozen third branch's arch is recorded for drop-in serving
    assert meta["expert_params"]["base_channels"] == 8
    engine = InferenceEngine(EngineConfig(
        img_size=32, diffusion_steps=2, hybrid_diffusion_steps=2,
        ckpt_dir=ckpt_dir, warmup=False,
        expert_cfg=c.ExpertConfig(base_channels=8),
    ))
    eval_set = make_eval_set(n_per_noise=1, img_size=32)
    r = score_fn(engine.fns["hybrid"], eval_set)
    assert np.isfinite(r["overall"]["psnr"])


def test_train_all_rejects_unknown_hybrid_profile(tmp_path):
    from midd_tpu.benchmarks.xray_bench import train_all

    import pytest

    with pytest.raises(ValueError, match="hybrid_profile"):
        train_all(str(tmp_path), hybrid_profile="typo")


def test_format_table_renders():
    from midd_tpu.benchmarks.xray_bench import format_table

    eval_set = make_eval_set(n_per_noise=1, img_size=32)
    results = {"_input": score_fn(lambda x: x, eval_set)}
    table = format_table(results)
    assert "_input" in table and "overall" in table
