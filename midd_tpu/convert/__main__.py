"""Checkpoint conversion CLI: reference torch ``.pth`` -> orbax checkpoint dirs.

    python -m midd_tpu.convert --model nafnet --pth models/NafNet.pth --out checkpoints/nafnet
    python -m midd_tpu.convert --model hybrid --pth models/Latest_Hybrid_Denoiser.pth --out checkpoints/hybrid

Reads arch hyperparams out of the checkpoint like the reference loaders do
(run.py:40-41 noise_steps, NafNet:634-638 width/blocks, hybrid:888-889 param
dicts), converts the state_dict(s), and writes an orbax tree + metadata.json.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main():
    # conversion is pure host work; never occupy (or depend on) an accelerator
    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True,
                    choices=["diffusion", "nafnet", "expert", "hybrid", "tiny"])
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from midd_tpu import config
    from midd_tpu.convert.torch_import import convert_state_dict, load_pth
    from midd_tpu.utils.checkpoint import save_checkpoint

    ckpt = load_pth(args.pth)
    meta = {k: v for k, v in ckpt.items() if not k.endswith("state_dict")}
    x0 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    t0 = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(0)

    if args.model == "nafnet":
        from midd_tpu.models import EnhancedNAFNet

        cfg = config.NAFNetConfig(
            width=ckpt.get("width", 32),
            middle_blk_num=ckpt.get("middle_blk_num", 8),
            enc_blk_nums=tuple(ckpt.get("enc_blk_nums", (2, 2, 4, 6))),
            dec_blk_nums=tuple(ckpt.get("dec_blk_nums", (2, 2, 2, 2))),
        )
        model = EnhancedNAFNet(cfg)
        tree = convert_state_dict(ckpt["model_state_dict"], jax.jit(model.init)(key, x0))
        meta.update(cfg.asdict())
    elif args.model == "diffusion":
        from midd_tpu.models import UNetDiffusion

        model = UNetDiffusion(config.SERVE_DIFFUSION)
        tree = convert_state_dict(
            ckpt["model_state_dict"], jax.jit(model.init)(key, x0, x0, t0)
        )
    elif args.model == "expert":
        from midd_tpu.models import ExpertDenoiser

        model = ExpertDenoiser(config.SERVE_EXPERT)
        tree = convert_state_dict(ckpt["model_state_dict"], jax.jit(model.init)(key, x0))
    elif args.model == "tiny":
        from midd_tpu.models import TinyUNet

        model = TinyUNet(config.TINY_UNET)
        tree = convert_state_dict(
            ckpt["model_state_dict"], jax.jit(model.init)(key, x0, t0, x0)
        )
    else:  # hybrid: four param groups (hybrid3diffusionspeed.py:837-852)
        from midd_tpu.models import (
            EnhancedNAFNet,
            FusionModule,
            NoiseAnalyzer,
            UNetDiffusion,
        )

        nafp = ckpt.get("nafnet_params", {})
        naf_cfg = config.NAFNetConfig(
            width=nafp.get("width", 32),
            middle_blk_num=nafp.get("middle_blk_num", 8),
            enc_blk_nums=tuple(nafp.get("enc_blk_nums", (2, 2, 4, 6))),
            dec_blk_nums=tuple(nafp.get("dec_blk_nums", (2, 2, 2, 2))),
        )
        sd = ckpt["model_state_dict"]
        sub = lambda p: {k[len(p) + 1 :]: v for k, v in sd.items() if k.startswith(p + ".")}
        groups = {}
        for prefix, model, a in [
            ("nafnet", EnhancedNAFNet(naf_cfg), (x0,)),
            ("diffusion_unet", UNetDiffusion(config.SERVE_DIFFUSION), (x0, x0, t0)),
            ("router", NoiseAnalyzer(config.RouterConfig()), (x0,)),
            ("fusion", FusionModule(config.FusionConfig()), (x0, x0, x0)),
        ]:
            groups[prefix] = convert_state_dict(
                sub(prefix), jax.jit(model.init)(key, *a)
            )["params"]
        tree = groups

    save_checkpoint(args.out, tree, meta)
    n = sum(x.size for x in jax.tree_util.tree_leaves(tree))
    print(f"converted {args.pth} -> {args.out} ({n:,} params), metadata keys: {sorted(meta)}")


if __name__ == "__main__":
    main()
