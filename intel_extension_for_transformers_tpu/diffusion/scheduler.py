"""Diffusion noise schedulers: DDIM and PNDM, functional JAX.

TPU-native replacement for the schedulers behind the reference's
image2image plugin (reference: pipeline/plugins/image2image/ — a diffusers
StableDiffusionImg2ImgPipeline whose published numbers use the default PNDM
scheduler, docs/release_data.md:88). Design: every scheduler is a frozen
dataclass of precomputed coefficient ARRAYS indexed by an i32 step — no
Python state — so the whole denoise loop sits inside one `lax.fori_loop`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax.numpy as jnp


def _betas(
    num_train_timesteps: int, beta_start: float, beta_end: float, schedule: str
) -> np.ndarray:
    if schedule == "scaled_linear":  # stable-diffusion default
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps) ** 2
        )
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps)
    raise ValueError(f"unknown beta schedule {schedule!r}")


@dataclass(frozen=True)
class DDIMScheduler:
    """Deterministic DDIM (eta=0) with epsilon prediction."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"

    def __post_init__(self):
        betas = _betas(
            self.num_train_timesteps, self.beta_start, self.beta_end,
            self.beta_schedule,
        )
        ac = np.cumprod(1.0 - betas).astype(np.float32)
        object.__setattr__(self, "alphas_cumprod", jnp.asarray(ac))

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        """Descending training-timestep indices, diffusers-spaced."""
        step = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * step).round()[::-1].astype(np.int32)
        return jnp.asarray(ts.copy())

    def add_noise(self, x0, noise, t):
        a = self.alphas_cumprod[t]
        while a.ndim < x0.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    def step(self, eps, t, t_prev, sample):
        """One reverse step x_t → x_{t_prev} (eta=0).

        t_prev < 0 denotes the final step to x0 (alpha_prev = 1)."""
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(t_prev >= 0, self.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
        x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1.0 - a_prev) * eps
        return jnp.sqrt(a_prev) * x0 + dir_xt


@dataclass(frozen=True)
class PNDMScheduler:
    """PNDM (pseudo linear multistep, the SD1.x default).

    The first step seeds the eps history with a plain DDIM update. This is
    an approximation of diffusers' skip_prk_steps=True PLMS variant, whose
    first step is a Heun-style two-evaluation corrector — so the earliest
    steps deviate slightly from the SD1.5 reference scheduler before the
    multistep history takes over. Later steps use the same 2nd/3rd/4th-order
    Adams–Bashforth combination of stored eps. Functional: the eps history
    is part of the loop carry, shape (4, ...) — static for `lax.fori_loop`.
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"

    def __post_init__(self):
        betas = _betas(
            self.num_train_timesteps, self.beta_start, self.beta_end,
            self.beta_schedule,
        )
        ac = np.cumprod(1.0 - betas).astype(np.float32)
        object.__setattr__(self, "alphas_cumprod", jnp.asarray(ac))

    timesteps = DDIMScheduler.timesteps
    add_noise = DDIMScheduler.add_noise

    def init_history(self, shape, dtype=jnp.float32):
        return jnp.zeros((4,) + tuple(shape), dtype), jnp.int32(0)

    def step(self, eps, t, t_prev, sample, history, count):
        """→ (prev_sample, history, count). Multistep eps blending."""
        hist = jnp.concatenate([history[1:], eps[None]], axis=0)
        e1, e2, e3, e4 = hist[3], hist[2], hist[1], hist[0]
        blend2 = (3 * e1 - e2) / 2
        blend3 = (23 * e1 - 16 * e2 + 5 * e3) / 12
        blend4 = (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24
        eps_used = jnp.where(
            count == 0, e1,
            jnp.where(count == 1, blend2, jnp.where(count == 2, blend3, blend4)),
        )
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(
            t_prev >= 0, self.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0
        )
        # the PNDM phi update (Eq. 11, Liu et al.): identical algebra to DDIM
        # but applied with the blended eps
        x0 = (sample - jnp.sqrt(1.0 - a_t) * eps_used) / jnp.sqrt(a_t)
        prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps_used
        return prev, hist, count + 1
