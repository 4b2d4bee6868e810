"""Stable-Diffusion pipelines (text2img + img2img), whole-loop-jitted.

Re-creation of the reference's image2image plugin behavior
(reference: pipeline/plugins/image2image/ — diffusers
StableDiffusionImg2ImgPipeline; headline SD v1.5 bf16 512², 20 steps =
2.74 s, docs/release_data.md:88-89) designed for XLA: the ENTIRE denoise
loop — CFG-duplicated UNet evals included — runs inside one `lax.fori_loop`
in a single compiled program, so per-step Python/dispatch cost is zero (the
reference pays a framework round-trip per step).

img2img: encode the init image → add noise at `strength` → denoise the tail
of the schedule → decode. Classifier-free guidance batches (uncond, cond)
contexts into one UNet call (batch axis), the TPU-friendly formulation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.diffusion.clip import (
    ClipTextConfig,
    clip_text_apply,
    clip_text_init_params,
)
from intel_extension_for_transformers_tpu.diffusion.scheduler import DDIMScheduler
from intel_extension_for_transformers_tpu.diffusion.unet import (
    UNetConfig,
    unet_apply,
    unet_init_params,
)
from intel_extension_for_transformers_tpu.diffusion.vae import (
    VAEConfig,
    vae_decode,
    vae_encode,
    vae_init_params,
)


@dataclass(frozen=True)
class StableDiffusionConfig:
    unet: UNetConfig = field(default_factory=UNetConfig)
    vae: VAEConfig = field(default_factory=VAEConfig)
    text: ClipTextConfig = field(default_factory=ClipTextConfig)

    @classmethod
    def sd15(cls) -> "StableDiffusionConfig":
        return cls(UNetConfig.sd15(), VAEConfig.sd15(), ClipTextConfig.sd15())

    @classmethod
    def tiny(cls) -> "StableDiffusionConfig":
        t = ClipTextConfig.tiny()
        return cls(UNetConfig.tiny(cross_attn_dim=t.hidden_size), VAEConfig.tiny(), t)


@partial(
    jax.jit,
    static_argnames=("cfg", "num_steps", "guidance_scale", "dtype"),
)
def _denoise_loop(
    params, cfg, latents, context, uncond_context, timesteps, *,
    num_steps: int, guidance_scale: float, dtype,
):
    """The whole CFG denoise loop as ONE lax.fori_loop program."""
    sched = DDIMScheduler()
    ctx2 = jnp.concatenate([uncond_context, context], axis=0).astype(dtype)
    B = latents.shape[0]

    def body(i, lat):
        t = timesteps[i]
        t_prev = jnp.where(
            i + 1 < num_steps, timesteps[jnp.minimum(i + 1, num_steps - 1)], -1
        )
        lat2 = jnp.concatenate([lat, lat], axis=0).astype(dtype)
        t2 = jnp.full((2 * B,), t, jnp.int32)
        eps2 = unet_apply(params, cfg, lat2, t2, ctx2).astype(jnp.float32)
        eps_u, eps_c = jnp.split(eps2, 2, axis=0)
        eps = eps_u + guidance_scale * (eps_c - eps_u)
        return sched.step(eps, t, t_prev, lat)

    return jax.lax.fori_loop(0, num_steps, body, latents.astype(jnp.float32))


class StableDiffusionPipeline:
    """text2img + img2img over (unet, vae, text) param trees.

    `tokenizer(texts) -> (B, 77) ids` is injected (a real CLIP BPE when
    transformers is available, any tokenizer for tests)."""

    def __init__(
        self,
        params: dict,  # {"unet":…, "vae":…, "text":…}
        config: StableDiffusionConfig,
        tokenizer=None,
        dtype=jnp.bfloat16,
    ):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.scheduler = DDIMScheduler()

    @classmethod
    def random_init(cls, key, config: StableDiffusionConfig, **kw):
        ku, kv, kt = jax.random.split(key, 3)
        params = {
            "unet": unet_init_params(ku, config.unet),
            "vae": vae_init_params(kv, config.vae),
            "text": clip_text_init_params(kt, config.text),
        }
        return cls(params, config, **kw)

    # -------------------------- conditioning --------------------------

    def _encode_text(self, prompts) -> jax.Array:
        if isinstance(prompts, str):
            prompts = [prompts]
        L = self.config.text.max_length
        if self.tokenizer is not None:
            enc = self.tokenizer(
                prompts, padding="max_length", truncation=True, max_length=L,
                return_tensors="np",
            )
            ids = np.asarray(enc["input_ids"], np.int32)
        else:
            # deterministic fallback: bytes mod vocab (tests / no-tokenizer)
            V = self.config.text.vocab_size
            ids = np.zeros((len(prompts), L), np.int32)
            for i, p in enumerate(prompts):
                bs = list(p.encode("utf-8"))[: L]
                ids[i, : len(bs)] = [b % V for b in bs]
        return clip_text_apply(self.params["text"], self.config.text, jnp.asarray(ids))

    # ----------------------------- img2img -----------------------------

    def img2img(
        self,
        prompt,
        image,  # (B, H, W, 3) in [-1, 1]
        *,
        strength: float = 0.75,
        num_inference_steps: int = 20,
        guidance_scale: float = 7.5,
        negative_prompt: str = "",
        seed: int = 0,
    ) -> np.ndarray:
        """→ (B, H, W, 3) images in [-1, 1]
        (reference: Image2Image plugin forward, SD img2img semantics)."""
        image = jnp.asarray(image, jnp.float32)
        B = image.shape[0]
        context = self._encode_text(prompt if isinstance(prompt, list) else [prompt] * B)
        uncond = self._encode_text([negative_prompt] * B)

        rng = jax.random.PRNGKey(seed)
        k_enc, k_noise = jax.random.split(rng)
        latents = vae_encode(self.params["vae"], self.config.vae, image)
        # noise to the strength-determined start step
        all_ts = self.scheduler.timesteps(num_inference_steps)
        t_start = max(num_inference_steps - int(num_inference_steps * strength), 0)
        ts = all_ts[t_start:]
        n_steps = int(ts.shape[0])
        if n_steps == 0:
            return np.asarray(vae_decode(self.params["vae"], self.config.vae, latents))
        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        latents = self.scheduler.add_noise(latents, noise, ts[0])

        latents = _denoise_loop(
            self.params["unet"], self.config.unet, latents, context, uncond, ts,
            num_steps=n_steps, guidance_scale=float(guidance_scale),
            dtype=self.dtype,
        )
        return np.asarray(vae_decode(self.params["vae"], self.config.vae, latents))

    # ----------------------------- text2img -----------------------------

    def text2img(
        self,
        prompt,
        *,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 20,
        guidance_scale: float = 7.5,
        negative_prompt: str = "",
        seed: int = 0,
    ) -> np.ndarray:
        prompts = prompt if isinstance(prompt, list) else [prompt]
        B = len(prompts)
        # VAE spatial factor = 2^(n_blocks-1): 8 for SD1.5, 2 for tiny
        f = 2 ** (len(self.config.vae.block_channels) - 1)
        h = (height or self.config.unet.sample_size * f) // f
        w = (width or self.config.unet.sample_size * f) // f
        context = self._encode_text(prompts)
        uncond = self._encode_text([negative_prompt] * B)
        ts = self.scheduler.timesteps(num_inference_steps)
        latents = jax.random.normal(
            jax.random.PRNGKey(seed),
            (B, h, w, self.config.unet.in_channels),
            jnp.float32,
        )
        latents = _denoise_loop(
            self.params["unet"], self.config.unet, latents, context, uncond, ts,
            num_steps=num_inference_steps, guidance_scale=float(guidance_scale),
            dtype=self.dtype,
        )
        return np.asarray(vae_decode(self.params["vae"], self.config.vae, latents))
