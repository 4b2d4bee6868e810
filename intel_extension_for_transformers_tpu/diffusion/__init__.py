from intel_extension_for_transformers_tpu.diffusion.scheduler import (
    DDIMScheduler,
    PNDMScheduler,
)
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
from intel_extension_for_transformers_tpu.diffusion.clip import (
    ClipTextConfig,
    clip_text_apply,
    clip_text_init_params,
)
from intel_extension_for_transformers_tpu.diffusion.pipeline import (
    StableDiffusionConfig,
    StableDiffusionPipeline,
)

__all__ = [
    "DDIMScheduler",
    "PNDMScheduler",
    "UNetConfig",
    "unet_apply",
    "unet_init_params",
    "VAEConfig",
    "vae_encode",
    "vae_decode",
    "vae_init_params",
    "ClipTextConfig",
    "clip_text_apply",
    "clip_text_init_params",
    "StableDiffusionConfig",
    "StableDiffusionPipeline",
]
