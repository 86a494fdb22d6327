"""Full checkpoint round trip: a reference-style torch ``.pth`` is dropped in
the engine's checkpoint dir, the engine rebuilds the arch FROM the checkpoint
(run.py:45-47 semantics), and the served output matches the torch model."""

import numpy as np
import pytest

import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import load_reference

from midd_tpu import config
from midd_tpu.serve.engine import EngineConfig, InferenceEngine

TINY_KW = dict(width=8, middle_blk_num=1, enc_blk_nums=[1, 1], dec_blk_nums=[1, 1])


@pytest.fixture(scope="module")
def pth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpts")
    ref = load_reference()
    torch.manual_seed(11)
    m = ref["nafnet"].EnhancedNAFNet(**TINY_KW).eval()
    torch.save(
        {
            "model_state_dict": m.state_dict(),
            "best_psnr": 30.0,
            "best_ssim": 0.9,
            **TINY_KW,
        },
        d / "nafnet.pth",
    )
    return str(d), m


def test_engine_serves_converted_pth(pth_dir, rng):
    ckpt_dir, torch_model = pth_dir
    engine = InferenceEngine(
        EngineConfig(
            img_size=32,
            diffusion_steps=2,
            hybrid_diffusion_steps=2,
            # deliberately WRONG static nafnet cfg: the checkpoint must win
            nafnet_cfg=config.NAFNetConfig(
                width=16, middle_blk_num=2, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)
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
            schedule_cfg=config.ScheduleConfig(noise_steps=6),
            ckpt_dir=ckpt_dir,
            warmup=False,
        )
    )
    assert engine.meta["nafnet"].get("best_psnr") == 30.0

    x = np.clip(rng.random((1, 32, 32, 1), dtype=np.float32), 0, 1)
    ours = np.asarray(engine.fns["nafnet"](jnp.asarray(x)))
    with torch.no_grad():
        theirs = torch_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    theirs = np.clip(np.transpose(theirs.numpy(), (0, 2, 3, 1)), 0, 1)
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_engine_serves_orbax_dir(pth_dir, rng, tmp_path):
    """Converted orbax checkpoint dirs load identically."""
    ckpt_dir, torch_model = pth_dir
    import subprocess, sys, os

    out_dir = tmp_path / "ck"
    env = dict(os.environ, JAX_PLATFORMS="cpu", OMP_NUM_THREADS="1")
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "midd_tpu.convert",
            "--model",
            "nafnet",
            "--pth",
            os.path.join(ckpt_dir, "nafnet.pth"),
            "--out",
            str(out_dir / "nafnet"),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=280,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]

    engine = InferenceEngine(
        EngineConfig(
            img_size=32,
            diffusion_steps=2,
            hybrid_diffusion_steps=2,
            nafnet_cfg=config.NAFNetConfig(
                width=16, middle_blk_num=2, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)
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
            schedule_cfg=config.ScheduleConfig(noise_steps=6),
            ckpt_dir=str(out_dir),
            warmup=False,
        )
    )
    x = np.clip(rng.random((1, 32, 32, 1), dtype=np.float32), 0, 1)
    ours = np.asarray(engine.fns["nafnet"](jnp.asarray(x)))
    with torch.no_grad():
        theirs = torch_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    theirs = np.clip(np.transpose(theirs.numpy(), (0, 2, 3, 1)), 0, 1)
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_engine_serves_trainer_checkpoints(rng, tmp_path):
    """The framework's OWN Trainer checkpoints must be servable: expert
    (batch_stats under extra) and hybrid (router+fusion only -> backend
    fallback to the standalone paths)."""
    from midd_tpu.train import data
    from midd_tpu.train.recipes import train_expert, train_hybrid
    from midd_tpu.train.trainer import TrainConfig

    clean = rng.random((4, 16, 16, 1)).astype(np.float32)
    ds = data.SyntheticPairedDataset(clean, is_train=False)

    tiny_naf = config.NAFNetConfig(
        width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)
    )
    tiny_unet = config.DiffusionUNetConfig(
        model_channels=8, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(1,), time_emb_dim=16,
    )

    train_expert(
        ds,
        model_cfg=config.ExpertConfig(base_channels=8),
        train_cfg=TrainConfig(epochs=1, batch_size=2, lr=1e-3,
                              ckpt_dir=str(tmp_path), ckpt_name="expert",
                              num_workers=0, prefetch=0),
    )
    train_hybrid(
        ds,
        nafnet_ckpt=None,
        diffusion_ckpt=None,
        hybrid_cfg=config.HybridConfig(
            nafnet=tiny_naf, diffusion=tiny_unet,
            schedule=config.ScheduleConfig(noise_steps=6),
            router=config.RouterConfig(base_c=8),
            fusion=config.FusionConfig(base_c=16),
            training_diffusion_steps=2, inference_diffusion_steps=2,
        ),
        train_cfg=TrainConfig(epochs=1, batch_size=2, lr=1e-3,
                              ckpt_dir=str(tmp_path), ckpt_name="hybrid",
                              num_workers=0, prefetch=0),
    )

    engine = InferenceEngine(
        EngineConfig(
            img_size=16,
            diffusion_steps=2,
            hybrid_diffusion_steps=2,
            nafnet_cfg=tiny_naf,
            diffusion_cfg=tiny_unet,
            expert_cfg=config.ExpertConfig(base_channels=8),
            router_cfg=config.RouterConfig(base_c=8),
            fusion_cfg=config.FusionConfig(base_c=16),
            schedule_cfg=config.ScheduleConfig(noise_steps=6),
            ckpt_dir=str(tmp_path),
            warmup=False,
        )
    )
    x = jnp.asarray(np.clip(rng.random((1, 16, 16, 1), dtype=np.float32), 0, 1))
    for name in ("expert", "hybrid", "nafnet", "diffusion"):
        out = np.asarray(engine.fns[name](x))
        assert out.shape == (1, 16, 16, 1)
        assert np.isfinite(out).all(), name


def test_engine_reads_diffusion_arch_from_metadata(rng, tmp_path):
    """A diffusion checkpoint trained at a NON-default width must serve with
    the DEFAULT engine config: the standalone diffusion path reads the arch
    from checkpoint metadata (run.py semantics; how the wide w96 variant
    serves as a drop-in), with a stem-kernel width-inference fallback for
    arch-less checkpoints."""
    from midd_tpu.train import data
    from midd_tpu.train.recipes import train_diffusion
    from midd_tpu.train.trainer import TrainConfig

    clean = rng.random((2, 16, 16, 1)).astype(np.float32)
    ds = data.SyntheticPairedDataset(clean, is_train=False)
    wide_cfg = config.DiffusionUNetConfig(
        model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(1,), time_emb_dim=32,
    )
    train_diffusion(
        ds, model_cfg=wide_cfg,
        schedule_cfg=config.ScheduleConfig(noise_steps=6),
        train_cfg=TrainConfig(epochs=1, batch_size=1, lr=1e-3,
                              ckpt_dir=str(tmp_path), ckpt_name="diffusion",
                              num_workers=0, prefetch=0),
        val_inference_steps=2,
    )
    # engine configured with a DIFFERENT (8-wide) default arch
    engine = InferenceEngine(
        EngineConfig(
            img_size=16,
            diffusion_steps=2,
            hybrid_diffusion_steps=2,
            nafnet_cfg=config.NAFNetConfig(width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)),
            diffusion_cfg=config.DiffusionUNetConfig(model_channels=8, channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(1,), time_emb_dim=16),
            expert_cfg=config.ExpertConfig(base_channels=8),
            router_cfg=config.RouterConfig(base_c=8),
            fusion_cfg=config.FusionConfig(base_c=16),
            schedule_cfg=config.ScheduleConfig(noise_steps=6),
            ckpt_dir=str(tmp_path),
            warmup=False,
        )
    )
    x = jnp.asarray(np.clip(rng.random((1, 16, 16, 1), dtype=np.float32), 0, 1))
    out = np.asarray(engine.fns["diffusion"](x))
    assert out.shape == (1, 16, 16, 1)
    assert np.isfinite(out).all()


def test_engine_reads_router_fusion_arch_from_hybrid_metadata(rng, tmp_path):
    """Hybrid variant checkpoints (wider fusion, residual head) serve drop-in:
    the engine builds router/fusion from the checkpoint's router_params/
    fusion_params metadata, overriding the static configs — same rule as
    nafnet_params/diffusion_params (run.py:61-62)."""
    from midd_tpu.models import FusionModule, NoiseAnalyzer
    from midd_tpu.utils.checkpoint import save_checkpoint

    r_cfg = config.RouterConfig(base_c=16)          # != engine default below
    f_cfg = config.FusionConfig(base_c=32, residual=True)
    x0 = jnp.zeros((1, 16, 16, 1))
    router_p = NoiseAnalyzer(r_cfg).init(jax.random.PRNGKey(0), x0)["params"]
    fusion_p = FusionModule(f_cfg).init(
        jax.random.PRNGKey(1), x0, x0, x0
    )["params"]
    save_checkpoint(
        str(tmp_path / "hybrid"),
        {"params": {"router": router_p, "fusion": fusion_p}},
        {"router_params": r_cfg.asdict(), "fusion_params": f_cfg.asdict()},
    )

    engine = InferenceEngine(
        EngineConfig(
            img_size=16,
            diffusion_steps=2,
            hybrid_diffusion_steps=2,
            nafnet_cfg=config.NAFNetConfig(width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)),
            diffusion_cfg=config.DiffusionUNetConfig(model_channels=8, channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(1,), time_emb_dim=16),
            expert_cfg=config.ExpertConfig(base_channels=8),
            # deliberately WRONG static configs: metadata must win
            router_cfg=config.RouterConfig(base_c=8),
            fusion_cfg=config.FusionConfig(base_c=16),
            schedule_cfg=config.ScheduleConfig(noise_steps=6),
            ckpt_dir=str(tmp_path),
            warmup=False,
        )
    )
    x = jnp.asarray(np.clip(rng.random((1, 16, 16, 1), dtype=np.float32), 0, 1))
    out = np.asarray(engine.fns["hybrid"](x))
    assert out.shape == (1, 16, 16, 1)
    assert np.isfinite(out).all()


def test_hybrid_expert_branch_prefers_ftl2_tree(rng, tmp_path):
    """Two expert param trees (round-5): the standalone expert path serves
    <ckpt_dir>/expert while a sees_expert hybrid's third branch serves
    <ckpt_dir>/expert_ftl2 when present (the l2-polished branch checkpoint
    train_all writes) — the standalone row no longer pays the branch's
    polish (round-4 verdict weak #3). Without expert_ftl2 the branch falls
    back to sharing the standalone tree."""
    import shutil

    from midd_tpu.models import ExpertDenoiser, FusionModule, NoiseAnalyzer
    from midd_tpu.utils.checkpoint import save_checkpoint

    x0 = jnp.zeros((1, 16, 16, 1))
    exp_cfg = config.ExpertConfig(base_channels=8)
    expert = ExpertDenoiser(exp_cfg)
    v_ref = expert.init(jax.random.PRNGKey(0), x0)
    v_ftl2 = expert.init(jax.random.PRNGKey(1), x0)  # distinct weights

    r_cfg = config.RouterConfig(base_c=8)
    f_cfg = config.FusionConfig(base_c=16, residual=True, sees_expert=True)
    router_p = NoiseAnalyzer(r_cfg).init(jax.random.PRNGKey(2), x0)["params"]
    fusion_p = FusionModule(f_cfg).init(
        jax.random.PRNGKey(3), x0, x0, x0, x0
    )["params"]
    # the residual profile zero-inits the fusion head, which would mute the
    # expert branch entirely — give every fusion weight a non-zero value so
    # differing branch weights are visible in the output
    fusion_p = jax.tree_util.tree_map(
        lambda a: jnp.full_like(a, 0.05), fusion_p
    )

    d_two = tmp_path / "two_trees"
    save_checkpoint(str(d_two / "expert"),
                    {"params": v_ref["params"],
                     "batch_stats": v_ref["batch_stats"]}, {})
    save_checkpoint(str(d_two / "expert_ftl2"),
                    {"params": v_ftl2["params"],
                     "batch_stats": v_ftl2["batch_stats"]}, {})
    save_checkpoint(str(d_two / "hybrid"),
                    {"params": {"router": router_p, "fusion": fusion_p}},
                    {"router_params": r_cfg.asdict(),
                     "fusion_params": f_cfg.asdict()})
    # a second dir WITHOUT expert_ftl2 -> branch shares the standalone tree
    d_one = tmp_path / "one_tree"
    d_one.mkdir()
    shutil.copytree(d_two / "expert", d_one / "expert")
    shutil.copytree(d_two / "hybrid", d_one / "hybrid")

    def build(ckpt_dir):
        return InferenceEngine(EngineConfig(
            img_size=16, diffusion_steps=2, hybrid_diffusion_steps=2,
            nafnet_cfg=config.NAFNetConfig(width=8, middle_blk_num=1,
                                           enc_blk_nums=(1, 1),
                                           dec_blk_nums=(1, 1)),
            diffusion_cfg=config.DiffusionUNetConfig(
                model_channels=8, channel_mult=(1, 2), num_res_blocks=1,
                attention_resolutions=(1,), time_emb_dim=16),
            expert_cfg=exp_cfg,
            router_cfg=r_cfg, fusion_cfg=f_cfg,
            schedule_cfg=config.ScheduleConfig(noise_steps=6),
            ckpt_dir=str(ckpt_dir), warmup=False,
        ))

    eng_two = build(d_two)
    eng_one = build(d_one)
    assert eng_two.serving_mode()["hybrid_expert_tree"] == "expert_ftl2"
    assert eng_one.serving_mode()["hybrid_expert_tree"] == "shared"

    x = jnp.asarray(np.clip(rng.random((1, 16, 16, 1), dtype=np.float32), 0, 1))
    # standalone expert path: identical in both engines (reference-loss tree)
    out_exp_two = np.asarray(eng_two.fns["expert"](x))
    out_exp_one = np.asarray(eng_one.fns["expert"](x))
    np.testing.assert_allclose(out_exp_two, out_exp_one, atol=0)
    # and it serves the REFERENCE tree, not the polished one
    direct = np.clip(np.asarray(expert.apply(v_ref, x)), 0, 1)
    np.testing.assert_allclose(out_exp_two, direct, atol=1e-6)
    # hybrid path: differs between the engines (the branch weights differ)
    hyb_two = np.asarray(eng_two.fns["hybrid"](x))
    hyb_one = np.asarray(eng_one.fns["hybrid"](x))
    assert np.abs(hyb_two - hyb_one).max() > 1e-6
