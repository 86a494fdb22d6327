"""DDPM scheduler (diffusers-compatible semantics) for the TinyUNet pipeline.

The reference trains TinyUNet against a HuggingFace ``DDPMScheduler``
(1000 timesteps, linear betas, epsilon prediction,
newfastmodel/fastmodeltraining.py:27) and its legacy serving pipeline samples
12 steps from the *noisy image itself* in [-1, 1]
(Backend/denoiser.py:35-47 — note: dead code upstream, it imports a module
that does not exist; this implementation actually runs).

Semantics implemented (diffusers DDPMScheduler defaults):
- ``add_noise``: sqrt(ac_t) x0 + sqrt(1-ac_t) eps
- leading timestep spacing: t_i = (T // steps) * i, descending
- ``step``: epsilon-parameterised posterior with clip_sample to [-1, 1] and
  fixed-small variance, noise added for t > 0
- ``sample``: the full rollout as one ``lax.scan``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


class DDPMScheduler:
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        clip_sample: bool = True,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.betas = jnp.linspace(beta_start, beta_end, num_train_timesteps, dtype=jnp.float32)
        self.alphas = 1.0 - self.betas
        self.alphas_cumprod = jnp.cumprod(self.alphas)
        self.clip_sample = clip_sample

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        ac = self.alphas_cumprod[t][:, None, None, None]
        return jnp.sqrt(ac) * x0 + jnp.sqrt(1.0 - ac) * noise

    def timesteps(self, steps: int) -> jnp.ndarray:
        ratio = self.num_train_timesteps // steps
        return (jnp.arange(steps, dtype=jnp.int32) * ratio)[::-1]

    def step(
        self,
        eps: jnp.ndarray,
        t: jnp.ndarray,
        sample: jnp.ndarray,
        steps: int,
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        prev_t = t - self.num_train_timesteps // steps
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        beta_t = 1.0 - a_t / a_prev
        alpha_t = a_t / a_prev

        x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)

        coef_x0 = jnp.sqrt(a_prev) * beta_t / (1.0 - a_t)
        coef_xt = jnp.sqrt(alpha_t) * (1.0 - a_prev) / (1.0 - a_t)
        mean = coef_x0 * x0 + coef_xt * sample

        var = jnp.clip((1.0 - a_prev) / (1.0 - a_t) * beta_t, 1e-20, None)
        if key is not None:
            noise = jax.random.normal(key, sample.shape, jnp.float32)
            mean = mean + jnp.where(t > 0, jnp.sqrt(var) * noise, 0.0)
        return mean

    def sample(
        self,
        eps_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
        cond: jnp.ndarray,
        steps: int = 12,
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Full rollout starting from the conditioned image itself
        (denoiser.py:36-46), as one scan. ``eps_fn(latents, t_batch, cond)``.
        """
        ts = self.timesteps(steps)
        keys = (
            jax.random.split(key, steps)
            if key is not None
            else jnp.zeros((steps, 2), jnp.uint32)
        )
        batch = cond.shape[0]

        def body(latents, scan_in):
            t, k = scan_in
            t_b = jnp.full((batch,), t, jnp.int32)
            eps = eps_fn(latents, t_b, cond)
            latents = self.step(eps, t, latents, steps, k if key is not None else None)
            return latents, None

        latents, _ = jax.lax.scan(body, cond, (ts, keys))
        return latents


class TinyUNetDenoiser:
    """Working equivalent of the reference's legacy ``XRayDenoiser``
    (Backend/denoiser.py:9-53): 256x256, [-1,1] domain, 12-step DDPM."""

    def __init__(self, params, model=None, img_size: int = 256, steps: int = 12):
        from midd_tpu import config as _config
        from midd_tpu.models import TinyUNet

        self.model = model or TinyUNet(_config.TINY_UNET)
        self.params = params
        self.img_size = img_size
        self.steps = steps
        self.scheduler = DDPMScheduler()

        def _run(x, key):
            eps = lambda lat, t, c: self.model.apply({"params": self.params}, lat, t, c)
            return self.scheduler.sample(eps, x, steps=self.steps, key=key)

        self._run = jax.jit(_run)

    def denoise(self, image_bytes: bytes, key=None):
        import io

        import numpy as np
        from PIL import Image

        img = Image.open(io.BytesIO(image_bytes)).convert("L")
        resized = img.resize((self.img_size, self.img_size), Image.BICUBIC)
        x = (np.asarray(resized, np.float32) / 255.0)[None, ..., None]
        x = x * 2.0 - 1.0  # Normalize([0.5],[0.5])
        if key is None:
            key = jax.random.PRNGKey(0)
        out = np.asarray(self._run(jnp.asarray(x), key))
        arr = np.clip((out[0, :, :, 0] + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)
        return Image.fromarray(arr, mode="L")
