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
    """PNDM with skip_prk_steps (PLMS — the SD1.x default), diffusers-exact.

    The first sampling interval uses the Heun two-evaluation corrector
    (diffusers scheduling_pndm.py step_plms counter 0/1): call 0 takes a
    plain eps step to an intermediate sample, call 1 re-evaluates eps THERE
    and redoes the same interval from the stashed start sample with the
    trapezoid average (e0+e1)/2 — so `timesteps()` has n+1 entries with the
    second one duplicated, and the Heun evaluation never enters the
    multistep history. Later steps use the 2nd/3rd/4th-order
    Adams–Bashforth combination of stored eps. Functional: the eps history,
    call counter, and the stashed first-interval (sample, t) are all loop
    carry — static shapes for `lax.fori_loop`.
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

    add_noise = DDIMScheduler.add_noise

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        """Descending model-eval timesteps, SECOND entry duplicated for the
        Heun corrector pass → length num_inference_steps + 1 (diffusers
        plms_timesteps with skip_prk_steps=True)."""
        step = self.num_train_timesteps // num_inference_steps
        asc = (np.arange(num_inference_steps) * step).round().astype(np.int32)
        plms = np.concatenate([asc[:-1], asc[-2:-1], asc[-1:]])[::-1]
        return jnp.asarray(plms.copy())

    def init_history(self, shape, dtype=jnp.float32):
        """→ (eps history (4, ...), call count, stashed sample, stashed t)."""
        return (
            jnp.zeros((4,) + tuple(shape), dtype),
            jnp.int32(0),
            jnp.zeros(tuple(shape), dtype),
            jnp.int32(0),
        )

    def step(self, eps, t, t_prev, sample, history, count, stash, stash_t):
        """→ (prev_sample, history, count, stash, stash_t).

        Drive with consecutive pairs of `timesteps()` (t_prev = next entry,
        -1 past the end); at the duplicated entry the pair is (t1, t1) and
        the update is applied over the stashed (t0 → t1) interval.
        """
        # the Heun evaluation (count==1) is transient: it never enters ets
        pushed = jnp.concatenate([history[1:], eps[None]], axis=0)
        hist = jnp.where(count == 1, history, pushed)
        e1, e2, e3, e4 = hist[3], hist[2], hist[1], hist[0]
        heun = (eps + hist[3]) / 2  # hist[3] = e0 when count == 1
        blend2 = (3 * e1 - e2) / 2
        blend3 = (23 * e1 - 16 * e2 + 5 * e3) / 12
        blend4 = (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24
        eps_used = jnp.where(
            count == 0, e1,
            jnp.where(count == 1, heun,
                      jnp.where(count == 2, blend2,
                                jnp.where(count == 3, blend3, blend4))),
        )
        # count==1 redoes the FIRST interval from the stashed start sample
        base = jnp.where(count == 1, stash, sample)
        t_start = jnp.where(count == 1, stash_t, t)
        a_t = self.alphas_cumprod[t_start]
        a_prev = jnp.where(
            t_prev >= 0, self.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0
        )
        # the PNDM phi update (Eq. 11, Liu et al.): identical algebra to DDIM
        # but applied with the blended eps
        x0 = (base - jnp.sqrt(1.0 - a_t) * eps_used) / jnp.sqrt(a_t)
        prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps_used
        stash = jnp.where(count == 0, sample, stash)
        stash_t = jnp.where(count == 0, t, stash_t)
        return prev, hist, count + 1, stash, stash_t
