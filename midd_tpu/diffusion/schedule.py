"""Linear beta schedule (DDIM/DDIMModel.py:251-257): beta linspace
(beta_start..beta_end, noise_steps), alpha = 1-beta, alpha_hat = cumprod."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from midd_tpu.config import ScheduleConfig


class Schedule(NamedTuple):
    beta: jnp.ndarray
    alpha: jnp.ndarray
    alpha_hat: jnp.ndarray

    @property
    def noise_steps(self) -> int:
        return self.beta.shape[0]


def make_schedule(cfg: ScheduleConfig = ScheduleConfig()) -> Schedule:
    beta = jnp.linspace(cfg.beta_start, cfg.beta_end, cfg.noise_steps, dtype=jnp.float32)
    alpha = 1.0 - beta
    alpha_hat = jnp.cumprod(alpha)
    return Schedule(beta=beta, alpha=alpha, alpha_hat=alpha_hat)


def timestep_sequence(noise_steps: int, inference_steps: int) -> list[int]:
    """The reference's strided reverse sequence
    (``reversed(range(0, noise_steps, max(1, noise_steps // inference_steps)))``,
    DDIM/DDIMModel.py:272-274). NOTE the off-by-one the reference has:
    "8 steps" over 50 -> stride 6 -> NINE iterations t = 48,42,...,6,0."""
    step_size = max(1, noise_steps // inference_steps)
    return list(reversed(range(0, noise_steps, step_size)))
