"""Per-model training recipes with the reference's exact hyperparameters.

One entry point per reference trainer:
- ``train_nafnet``     (NafNet/NafnetModel.py:405-624: epochs 50, bs 2, lr 2e-4,
                        warmup 5 + cosine, CombinedLoss)
- ``train_diffusion``  (DDIM/DDIMModel.py:302-468: epochs 30, bs 1, lr 2e-4,
                        cosine eta lr/100, eps-MSE + 0.2 edge-on-x0)
- ``train_expert``     (DirectUNet/DirectUNetModel.py:281-421: epochs 70, bs 4,
                        lr 1e-4, wd 1e-5, warmup 5 linear + cosine, HybridLoss)
- ``train_hybrid``     (hybrid3diffusionspeed.py:631-876: epochs 50, bs 6,
                        lr 4e-4, cosine eta lr/50, PerceptualLoss, frozen
                        backends, patience 20, full resume)
- ``train_tiny``       (newfastmodel/fastmodeltraining.py:23-79: epochs 18-20,
                        bs 4, lr 1.5e-4, wd 1e-6, 1000-step DDPM schedule,
                        loss vs noise)

Each returns the final TrainerState; best checkpoints land in
``cfg.ckpt_dir`` with reference-schema metadata (arch hyperparams included,
like NafNet:566-581 / hybrid:837-852).

CLI:
    python -m midd_tpu.train.recipes --model nafnet \
        --clear-dir data/clean --noisy-dirs data/noisy [--resume] ...
"""

from __future__ import annotations

from dataclasses import replace
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from midd_tpu import config
from midd_tpu.train.trainer import (
    TrainConfig,
    Trainer,
    diffusion_loss_fn,
    expert_loss_fn,
    hybrid_loss_fn,
    nafnet_loss_fn,
    plot_training_curves,
    tiny_loss_fn,
)


def _val_samples(dataset, n: int) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Hold out the first n samples like the reference trainers
    (DDIM:336-338 uses 1; hybrid:740-744 uses 5)."""
    return [dataset[i] for i in range(min(n, len(dataset)))]



def _auto_flash(use_flash):
    """Resolve the flash-attention flag: None = on for TPU-class backends
    (the Pallas kernel, now differentiable), off on CPU (tests use interpret
    mode explicitly via the ops tests)."""
    if use_flash is None:
        import jax as _jax

        return _jax.default_backend() in ("tpu", "axon")
    return use_flash

def train_nafnet(
    dataset,
    model_cfg: config.NAFNetConfig = config.SERVE_NAFNET,
    train_cfg: Optional[TrainConfig] = None,
    resume: Optional[str] = None,
    loss_variant: str = "reference",
    init_from: Optional[str] = None,
    s2d_stage0: Optional[bool] = None,
):
    """``loss_variant``: "reference" (CombinedLoss, NafNet:349-386) or "l2"
    (pure MSE — the PSNR-aligned lever; same option as train_hybrid so the
    flagship comparison stays symmetric).

    ``init_from``: checkpoint to initialise the PARAMETERS from (fresh
    optimizer/epoch/schedule — a fine-tune, unlike ``resume`` which restores
    the full training state).

    ``s2d_stage0``: run the C=width full-resolution stage in the 2x2
    space-to-depth layout (ops/naf_s2d.py) during TRAINING too — numerically
    equivalent fwd AND bwd (same param tree: checkpoints are unaffected;
    tests/test_recipes.py pins the loss trajectory). The forward's C=32
    lane-padding waste is amplified in the backward (round-4 bench_train:
    ~2% model MFU), so the layout is a training lever, not just a serving
    one. None = auto: on for TPU-class backends, off on CPU."""
    from midd_tpu.models import EnhancedNAFNet

    cfg = train_cfg or TrainConfig(
        epochs=50, batch_size=2, lr=2e-4, weight_decay=1e-4, warmup_epochs=5,
        ckpt_name="nafnet",
    )
    if s2d_stage0 is None:
        s2d_stage0 = jax.default_backend() in ("tpu", "axon")
    model = EnhancedNAFNet(model_cfg, s2d_stage0=s2d_stage0)
    sample = jnp.zeros((1, 64, 64, 1))
    if init_from:
        params = _load_backend(init_from, model, sample)
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(cfg.seed), sample)["params"]
    trainer = Trainer(
        loss_fn=nafnet_loss_fn(model, loss_variant=loss_variant),
        eval_fn=lambda p, extra, clean, noisy: model.apply({"params": p}, noisy),
        cfg=cfg,
        init_params=params,
    )
    if resume:
        trainer.resume(resume)
    state = trainer.fit(dataset, _val_samples(dataset, 1), metadata=model_cfg.asdict())
    plot_training_curves(state.history, "nafnet_training_curves.png")
    return state


def train_diffusion(
    dataset,
    model_cfg: config.DiffusionUNetConfig = config.SERVE_DIFFUSION,
    schedule_cfg: config.ScheduleConfig = config.SERVE_SCHEDULE,
    train_cfg: Optional[TrainConfig] = None,
    resume: Optional[str] = None,
    val_inference_steps: int = 15,  # DDIM:415
    use_flash: Optional[bool] = None,
):
    from midd_tpu.diffusion import denoise, make_schedule
    from midd_tpu.models import UNetDiffusion

    cfg = train_cfg or TrainConfig(
        epochs=30, batch_size=1, lr=2e-4, weight_decay=1e-4, ckpt_name="diffusion"
    )
    model = UNetDiffusion(model_cfg, use_flash=_auto_flash(use_flash))
    schedule = make_schedule(schedule_cfg)
    sample = jnp.zeros((1, 64, 64, 1))
    t0 = jnp.zeros((1,), jnp.int32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed), sample, sample, t0
    )["params"]

    def eval_fn(p, extra, clean, noisy):
        eps = lambda a, c, t: model.apply({"params": p}, a, c, t)
        return denoise(eps, noisy, schedule, inference_steps=val_inference_steps)

    trainer = Trainer(
        loss_fn=diffusion_loss_fn(model, schedule),
        eval_fn=eval_fn,
        cfg=cfg,
        init_params=params,
    )
    if resume:
        trainer.resume(resume)
    state = trainer.fit(
        dataset,
        _val_samples(dataset, 1),
        metadata={**model_cfg.asdict(), "noise_steps": schedule_cfg.noise_steps},
    )
    plot_training_curves(state.history, "diffusion_training_curves.png")
    return state


def train_cddpm(
    dataset,
    model_cfg: config.DiffusionUNetConfig = config.CDDPM_UNET,
    schedule_cfg: config.ScheduleConfig = config.SERVE_SCHEDULE,
    train_cfg: Optional[TrainConfig] = None,
    resume: Optional[str] = None,
    val_inference_steps: int = 15,
    use_flash: Optional[bool] = None,
):
    """cDDPM variant trainer (cddpm/cddpmModels.py:321-468): the tracked-skip
    UNet, plain MSE epsilon loss (:372-374), ancestral validation sampling
    with 0.5-scaled query noise (:297-302)."""
    from midd_tpu.diffusion import denoise, make_schedule, noise_images, sample_timesteps
    from midd_tpu.models import UNetDiffusion
    from midd_tpu.train import losses

    cfg = train_cfg or TrainConfig(
        epochs=30, batch_size=1, lr=2e-4, weight_decay=1e-4, ckpt_name="cddpm"
    )
    model = UNetDiffusion(model_cfg, use_flash=_auto_flash(use_flash))
    schedule = make_schedule(schedule_cfg)
    sample = jnp.zeros((1, 64, 64, 1))
    t0 = jnp.zeros((1,), jnp.int32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed), sample, sample, t0
    )["params"]

    def loss_fn(p, batch, rng):
        clean, noisy = batch
        k_t, k_eps = jax.random.split(rng)
        t = sample_timesteps(k_t, clean.shape[0], schedule.noise_steps)
        x_t, eps = noise_images(clean, t, schedule, k_eps)
        eps_pred = model.apply({"params": p}, x_t, noisy, t)
        return losses.mse(eps_pred, eps), {}

    def eval_fn(p, extra, clean, noisy):
        eps = lambda a, c, t: model.apply({"params": p}, a, c, t)
        return denoise(
            eps,
            noisy,
            schedule,
            inference_steps=val_inference_steps,
            stochastic=True,
            clamp_eps=False,
            key=jax.random.PRNGKey(0),
        )

    trainer = Trainer(loss_fn=loss_fn, eval_fn=eval_fn, cfg=cfg, init_params=params)
    if resume:
        trainer.resume(resume)
    state = trainer.fit(
        dataset,
        _val_samples(dataset, 1),
        metadata={**model_cfg.asdict(), "noise_steps": schedule_cfg.noise_steps},
    )
    return state


def train_expert(
    dataset,
    model_cfg: config.ExpertConfig = config.SERVE_EXPERT,
    train_cfg: Optional[TrainConfig] = None,
    resume: Optional[str] = None,
    dead_grad_ssim: bool = False,
    perceptual_weight: float = 0.3,
    loss_variant: str = "reference",
    init_from: Optional[str] = None,
):
    """``init_from``: checkpoint to initialise parameters AND BatchNorm
    statistics from (fresh optimizer/schedule — a fine-tune), the same
    params-only-polish lever train_nafnet grew for the l2 bar study."""
    from midd_tpu.models import ExpertDenoiser

    cfg = train_cfg or TrainConfig(
        epochs=70, batch_size=4, lr=1e-4, weight_decay=1e-5, warmup_epochs=5,
        ckpt_name="expert",
    )
    model = ExpertDenoiser(model_cfg)
    sample = jnp.zeros((1, 64, 64, 1))
    if init_from:
        variables = _load_backend_variables(init_from, model, sample)
        if "batch_stats" not in variables:
            variables = {
                **variables,
                "batch_stats": jax.jit(model.init)(
                    jax.random.PRNGKey(cfg.seed), sample
                )["batch_stats"],
            }
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(cfg.seed), sample)
    trainer = Trainer(
        loss_fn=expert_loss_fn(model, dead_grad_ssim=dead_grad_ssim,
                               perceptual_weight=perceptual_weight,
                               loss_variant=loss_variant),
        eval_fn=lambda p, extra, clean, noisy: model.apply(
            {"params": p, "batch_stats": extra["batch_stats"]}, noisy
        ),
        cfg=cfg,
        init_params=variables["params"],
        extra={"batch_stats": variables["batch_stats"]},
        has_batch_stats=True,
    )
    if resume:
        trainer.resume(resume)
    state = trainer.fit(dataset, _val_samples(dataset, 1), metadata=model_cfg.asdict())
    plot_training_curves(state.history, "expert_training_curves.png")
    return state


def train_hybrid(
    dataset,
    nafnet_ckpt: str,
    diffusion_ckpt: str,
    hybrid_cfg: config.HybridConfig = config.HybridConfig(),
    train_cfg: Optional[TrainConfig] = None,
    resume: Optional[str] = None,
    use_flash: Optional[bool] = None,
    expert_ckpt: Optional[str] = None,
    loss_variant: str = "reference",
):
    """Frozen-backend hybrid training (hybrid3diffusionspeed.py:631-876):
    only router+fusion receive gradients; backends come from the given
    checkpoints (orbax dirs or .pth). When ``hybrid_cfg.fusion.sees_expert``
    a third frozen branch (ExpertDenoiser from ``expert_ckpt``) feeds the
    fusion (TPU-native variant; measured +0.25 dB headroom from a fixed
    blend alone — see FusionConfig.sees_expert)."""
    from midd_tpu.diffusion import denoise, make_schedule
    from midd_tpu.models import (
        EnhancedNAFNet,
        ExpertDenoiser,
        FusionModule,
        NoiseAnalyzer,
        UNetDiffusion,
    )
    from midd_tpu.models.hybrid import hybrid_forward

    cfg = train_cfg or TrainConfig(
        epochs=50, batch_size=6, lr=4e-4, weight_decay=1e-4,
        eta_min_factor=0.02, patience=20, ckpt_name="hybrid",
    )
    naf = EnhancedNAFNet(hybrid_cfg.nafnet)
    unet = UNetDiffusion(hybrid_cfg.diffusion, use_flash=_auto_flash(use_flash))
    router = NoiseAnalyzer(hybrid_cfg.router)
    fusion = FusionModule(hybrid_cfg.fusion)
    schedule = make_schedule(hybrid_cfg.schedule)
    sees_expert = hybrid_cfg.fusion.sees_expert
    expert = ExpertDenoiser(hybrid_cfg.expert) if sees_expert else None

    sample = jnp.zeros((1, 64, 64, 1))
    t0 = jnp.zeros((1,), jnp.int32)
    naf_params = _load_backend(nafnet_ckpt, naf, sample)
    unet_params = _load_backend(diffusion_ckpt, unet, sample, sample, t0)

    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), 2)
    fusion_init_args = (sample,) * (4 if sees_expert else 3)
    trainable = {
        "router": jax.jit(router.init)(keys[0], sample)["params"],
        "fusion": jax.jit(fusion.init)(keys[1], *fusion_init_args)["params"],
    }

    # frozen backends ride the Trainer's runtime-argument path — closure
    # capture would bake them into the XLA program as constants (a w96
    # backend is ~200 MB, which the remote-compile tunnel rejects)
    frozen = {"nafnet": naf_params, "unet": unet_params}
    if sees_expert:
        frozen["expert"] = _load_backend_variables(expert_ckpt, expert, sample)

    def eval_fn(p, extra, clean, noisy, frozen):
        return hybrid_forward(
            lambda x: naf.apply({"params": frozen["nafnet"]}, x),
            lambda x: denoise(
                lambda a, c, t: unet.apply({"params": frozen["unet"]}, a, c, t),
                x,
                schedule,
                hybrid_cfg.inference_diffusion_steps,
            ),
            lambda x: router.apply({"params": p["router"]}, x),
            lambda *ins: fusion.apply({"params": p["fusion"]}, *ins),
            noisy,
            expert_apply=(
                (lambda x: expert.apply(frozen["expert"], x))
                if sees_expert else None
            ),
        )

    trainer = Trainer(
        loss_fn=hybrid_loss_fn(
            naf, unet, router, fusion, schedule,
            hybrid_cfg.training_diffusion_steps,
            expert_model=expert,
            loss_variant=loss_variant,
        ),
        eval_fn=eval_fn,
        cfg=cfg,
        init_params=trainable,
        frozen=frozen,
    )
    if resume:
        trainer.resume(resume)
    state = trainer.fit(
        dataset,
        _val_samples(dataset, 5),  # hybrid:740-744
        metadata={
            "nafnet_params": hybrid_cfg.nafnet.asdict(),
            "diffusion_params": {
                **hybrid_cfg.diffusion.asdict(),
                "noise_steps": hybrid_cfg.schedule.noise_steps,
            },
            # router/fusion arch so variant checkpoints (wider fusion,
            # residual head, expert-fed fusion) serve drop-in — the engine
            # reads these like run.py reads nafnet_params/diffusion_params
            "router_params": hybrid_cfg.router.asdict(),
            "fusion_params": hybrid_cfg.fusion.asdict(),
            **(
                {"expert_params": hybrid_cfg.expert.asdict()}
                if sees_expert else {}
            ),
        },
    )
    plot_training_curves(state.history, "hybrid_training_curves.png")
    return state


def train_tiny(
    dataset,
    model_cfg: config.TinyUNetConfig = config.TINY_UNET,
    train_cfg: Optional[TrainConfig] = None,
):
    from midd_tpu.diffusion import make_schedule
    from midd_tpu.models import TinyUNet

    cfg = train_cfg or TrainConfig(
        epochs=18, batch_size=4, lr=1.5e-4, weight_decay=1e-6, ckpt_name="tiny"
    )
    schedule_1000 = make_schedule(config.ScheduleConfig(noise_steps=1000))
    model = TinyUNet(model_cfg)
    sample = jnp.zeros((1, 64, 64, 1))
    t0 = jnp.zeros((1,), jnp.int32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed), sample, t0, sample
    )["params"]

    def eval_fn(p, extra, clean, noisy):
        # 12-step DDPM sampling in [-1,1] like the legacy serving pipeline
        from midd_tpu.diffusion.ddpm_scheduler import DDPMScheduler

        sch = DDPMScheduler()
        eps = lambda lat, t, c: model.apply({"params": p}, lat, t, c)
        out = sch.sample(eps, noisy * 2 - 1, steps=12, key=jax.random.PRNGKey(0))
        return (out + 1) / 2

    trainer = Trainer(
        loss_fn=tiny_loss_fn(model, schedule_1000),
        eval_fn=eval_fn,
        cfg=cfg,
        init_params=params,
    )
    state = trainer.fit(dataset, _val_samples(dataset, 1), metadata=model_cfg.asdict())
    return state


def _load_backend(ckpt: str, model, *example_args):
    """Load backend params from an orbax dir, a .pth file, or fall back to
    seeded random init (for tests/demo)."""
    return _load_backend_variables(ckpt, model, *example_args)["params"]


def _load_backend_variables(ckpt: str, model, *example_args):
    """Like _load_backend but returns the FULL variables dict (params +
    batch_stats when present — the ExpertDenoiser branch needs its
    BatchNorm statistics)."""
    import os

    if ckpt and os.path.isdir(ckpt):
        from midd_tpu.utils.checkpoint import load_checkpoint

        tree, _ = load_checkpoint(ckpt)
        variables = {"params": tree["params"]}
        bs = tree.get("batch_stats") or tree.get("extra", {}).get("batch_stats")
        if bs:
            variables["batch_stats"] = bs
        return variables
    if ckpt and os.path.exists(ckpt):
        from midd_tpu.utils.checkpoint import import_reference_checkpoint

        variables, _ = import_reference_checkpoint(ckpt, model, *example_args)
        return variables
    return jax.jit(model.init)(jax.random.PRNGKey(7), *example_args)


def main():
    import argparse

    from midd_tpu.train.data import PairedXRayDataset

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True,
                    choices=["nafnet", "diffusion", "cddpm", "expert", "hybrid", "tiny"])
    ap.add_argument("--clear-dir", required=True)
    ap.add_argument("--noisy-dirs", nargs="+", required=True)
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--max-samples", type=int, default=300)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--nafnet-ckpt", default=None)
    ap.add_argument("--diffusion-ckpt", default=None)
    ap.add_argument("--loss-variant", choices=["reference", "l2"],
                    default="reference",
                    help="nafnet/expert/hybrid objective: the reference loss "
                         "suite, or the PSNR-aligned pure-MSE option "
                         "(the round-3 ablation lever)")
    ap.add_argument("--preset", choices=["full", "tiny"], default="full",
                    help="tiny = smoke-test widths (verify the pipeline "
                         "before committing TPU-hours)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--mesh", default=None, metavar="DP,SP,TP",
                    help="multi-chip training mesh, e.g. '4,1,1' for 4-way "
                         "data parallelism or '2,1,2' for dp2 x tp2; batches "
                         "shard over dp, image rows over sp, large kernels "
                         "over tp (XLA inserts the collectives)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    dataset = PairedXRayDataset(
        args.clear_dir, args.noisy_dirs, img_size=args.img_size,
        max_samples=args.max_samples,
        substring_glob=(args.model == "hybrid"),
    )
    try:  # pre-training sanity figure (DirectUNet:286-303); never fatal
        from midd_tpu.train.data import visualize_pairs

        visualize_pairs(dataset)
    except Exception as e:  # noqa: BLE001
        print(f"(pair visualization skipped: {e})")

    overrides = {}
    if args.epochs:
        overrides["epochs"] = args.epochs
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.lr:
        overrides["lr"] = args.lr
    if args.mesh:
        dp, sp, tp = (int(x) for x in args.mesh.split(","))
        overrides["mesh_shape"] = (dp, sp, tp)

    defaults = {
        "nafnet": TrainConfig(epochs=50, batch_size=2, lr=2e-4, weight_decay=1e-4,
                              warmup_epochs=5, ckpt_name="nafnet"),
        "diffusion": TrainConfig(epochs=30, batch_size=1, lr=2e-4,
                                 weight_decay=1e-4, ckpt_name="diffusion"),
        "cddpm": TrainConfig(epochs=30, batch_size=1, lr=2e-4,
                             weight_decay=1e-4, ckpt_name="cddpm"),
        "expert": TrainConfig(epochs=70, batch_size=4, lr=1e-4, weight_decay=1e-5,
                              warmup_epochs=5, ckpt_name="expert"),
        "hybrid": TrainConfig(epochs=50, batch_size=6, lr=4e-4, weight_decay=1e-4,
                              eta_min_factor=0.02, patience=20, ckpt_name="hybrid"),
        "tiny": TrainConfig(epochs=18, batch_size=4, lr=1.5e-4,
                            weight_decay=1e-6, ckpt_name="tiny"),
    }
    cfg = replace(defaults[args.model], **overrides)

    tiny = args.preset == "tiny"
    naf_cfg = (
        config.NAFNetConfig(width=8, middle_blk_num=1, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
        if tiny else config.SERVE_NAFNET
    )
    unet_kw = dict(model_channels=8, channel_mult=(1, 2), num_res_blocks=1,
                   attention_resolutions=(1,), time_emb_dim=16)
    if args.model == "nafnet":
        train_nafnet(dataset, model_cfg=naf_cfg, train_cfg=cfg,
                     resume=args.resume, loss_variant=args.loss_variant)
    elif args.model == "diffusion":
        mc = config.DiffusionUNetConfig(**unet_kw) if tiny else config.SERVE_DIFFUSION
        train_diffusion(dataset, model_cfg=mc, train_cfg=cfg, resume=args.resume)
    elif args.model == "cddpm":
        mc = (config.DiffusionUNetConfig(skip_mode="cddpm", **unet_kw)
              if tiny else config.CDDPM_UNET)
        train_cddpm(dataset, model_cfg=mc, train_cfg=cfg, resume=args.resume)
    elif args.model == "expert":
        mc = config.ExpertConfig(base_channels=8) if tiny else config.SERVE_EXPERT
        train_expert(dataset, model_cfg=mc, train_cfg=cfg, resume=args.resume,
                     loss_variant=args.loss_variant)
    elif args.model == "hybrid":
        hc = config.HybridConfig(
            nafnet=naf_cfg,
            diffusion=config.DiffusionUNetConfig(**unet_kw),
            router=config.RouterConfig(base_c=8),
            fusion=config.FusionConfig(base_c=16),
            training_diffusion_steps=3,
            inference_diffusion_steps=3,
        ) if tiny else config.HybridConfig()
        train_hybrid(
            dataset,
            nafnet_ckpt=args.nafnet_ckpt,
            diffusion_ckpt=args.diffusion_ckpt,
            hybrid_cfg=hc,
            train_cfg=cfg,
            resume=args.resume,
            loss_variant=args.loss_variant,
        )
    else:
        mc = config.TinyUNetConfig(base_ch=8, time_dim=16) if tiny else config.TINY_UNET
        train_tiny(dataset, model_cfg=mc, train_cfg=cfg)


if __name__ == "__main__":
    main()
