"""Single-image inference CLI + test-time augmentation.

Covers the reference's manual inference utilities:
- ``denoise_image_nafnet`` with 4-flip TTA averaging (NafNet/NafnetModel.py:627-710)
- ``denoise_image_diffusion`` (DDIM/DDIMModel.py:470-504)
- ``denoise_image`` for the Expert (DirectUNet/DirectUNetModel.py:423-450)
- ``denoise_image_hybrid`` (hybrid3diffusionspeed.py:880-949)
- the CLI driver scripts (cddpminference.py, hybrid3diffusionspeedinference.py)

Usage:
    python -m midd_tpu.inference --model nafnet --image x.png --out out.png \
        [--ckpt-dir checkpoints] [--tta] [--steps 8] [--img-size 512]
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


def tta_4flip(fn: Callable[[jnp.ndarray], jnp.ndarray]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """4-flip test-time augmentation: average fn over identity/h/v/hv flips,
    un-flipping each prediction (NafNet/NafnetModel.py:670-692). Stays inside
    one jitted program."""

    def wrapped(x: jnp.ndarray) -> jnp.ndarray:
        preds = [
            fn(x),
            jnp.flip(fn(jnp.flip(x, axis=2)), axis=2),
            jnp.flip(fn(jnp.flip(x, axis=1)), axis=1),
            jnp.flip(fn(jnp.flip(x, axis=(1, 2))), axis=(1, 2)),
        ]
        return jnp.mean(jnp.stack(preds), axis=0)

    return wrapped


def denoise_image(
    model: str,
    image_path: str,
    ckpt_dir: str = "checkpoints",
    img_size: int = 512,
    steps: int = 8,
    tta: bool = False,
    bf16: bool = False,
    serving_defaults: bool = False,
):
    """Returns (PIL.Image at original size, inference seconds).

    Like ``midd_tpu.evaluate``, this is a reference-comparison tool: the
    gated-non-exact engine defaults (turbo refresh schedule, bf16 UNet
    evals) are pinned OFF unless ``serving_defaults=True``."""
    from midd_tpu.serve.codec import decode_to_tensor
    from midd_tpu.serve.engine import EngineConfig, InferenceEngine

    kw = {}
    if not serving_defaults:
        kw = dict(turbo_eps_reuse=1, hybrid_turbo_eps_reuse=1,
                  diffusion_eval_bf16=False, hybrid_rollout_bf16=False)
    cfg = EngineConfig(
        img_size=img_size,
        diffusion_steps=steps,
        hybrid_diffusion_steps=steps,
        ckpt_dir=ckpt_dir,
        compute_dtype=jnp.bfloat16 if bf16 else None,
        warmup=False,
        **kw,
    )
    engine = InferenceEngine(cfg)
    fn = engine.fns[model]
    if tta:
        fn = jax.jit(tta_4flip(fn))

    with open(image_path, "rb") as f:
        x, original_size = decode_to_tensor(f.read(), img_size)

    fn(jnp.asarray(x)).block_until_ready()  # compile
    t0 = time.time()
    out = np.asarray(fn(jnp.asarray(x)))
    dt = time.time() - t0

    arr = (np.clip(out[0, :, :, 0], 0, 1) * 255).astype(np.uint8)
    img = Image.fromarray(arr, mode="L").resize(original_size, Image.BICUBIC)
    return img, dt


def save_comparison(noisy_path: str, denoised_img, out_path: str) -> None:
    """Noisy / denoised / difference side-by-side figure, like the reference's
    visualize_results (NafNet/NafnetModel.py:713-736) and the inference
    scripts' comparison PNGs."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    original = Image.open(noisy_path).convert("L")
    fig, axes = plt.subplots(1, 3, figsize=(18, 6))
    axes[0].imshow(original, cmap="gray")
    axes[0].set_title("Noisy Input")
    axes[1].imshow(denoised_img, cmap="gray")
    axes[1].set_title("Denoised")
    diff = np.abs(
        np.asarray(original.resize(denoised_img.size), np.float32)
        - np.asarray(denoised_img, np.float32)
    )
    axes[2].imshow(diff, cmap="hot")
    axes[2].set_title("Noise Removed (difference)")
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", choices=["diffusion", "nafnet", "expert", "hybrid"], required=True)
    ap.add_argument("--image", required=True)
    ap.add_argument("--out", default="denoised.png")
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--serving-defaults", action="store_true",
                    help="use the gated-non-exact serving stack (turbo "
                         "refresh schedule + bf16 UNet evals) instead of "
                         "the default reference-exact numerics")
    ap.add_argument("--compare", default=None,
                    help="also save a noisy/denoised/difference comparison figure")
    args = ap.parse_args()

    img, dt = denoise_image(
        args.model,
        args.image,
        ckpt_dir=args.ckpt_dir,
        img_size=args.img_size,
        steps=args.steps,
        tta=args.tta,
        bf16=args.bf16,
        serving_defaults=args.serving_defaults,
    )
    img.save(args.out)
    print(f"{args.model}: {dt:.3f}s -> {args.out}")
    if args.compare:
        save_comparison(args.image, img, args.compare)
        print(f"comparison -> {args.compare}")


if __name__ == "__main__":
    main()
