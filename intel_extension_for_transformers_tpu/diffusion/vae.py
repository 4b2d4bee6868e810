"""AutoencoderKL (the SD VAE) in pure JAX, NHWC.

Encoder: conv_in → down blocks (2 res each, stride-2 between) → mid
(res, self-attn, res) → norm/silu/conv → moments (mean, logvar) → scaled
latent. Decoder mirrors it. Latent scaling 0.18215 (SD1.x convention).
Reference role: the diffusers AutoencoderKL behind the image2image plugin
(pipeline/plugins/image2image/)."""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.diffusion.unet import (
    _conv,
    _group_norm,
    _init_conv,
    _init_norm,
)


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215

    @classmethod
    def sd15(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_channels=(16, 32), layers_per_block=1, norm_groups=4)


def _res(x, p, groups):
    h = _conv(jax.nn.silu(_group_norm(x, p["norm1"], groups)), p["conv1"])
    h = _conv(jax.nn.silu(_group_norm(h, p["norm2"], groups)), p["conv2"])
    skip = _conv(x, p["shortcut"]) if "shortcut" in p else x
    return skip + h


def _self_attn_2d(x, p, groups):
    B, H, W, C = x.shape
    T = H * W
    h = _group_norm(x, p["norm"], groups).reshape(B, T, C)
    q = h @ p["q"]["kernel"].astype(x.dtype) + p["q"]["bias"].astype(x.dtype)
    k = h @ p["k"]["kernel"].astype(x.dtype) + p["k"]["bias"].astype(x.dtype)
    v = h @ p["v"]["kernel"].astype(x.dtype) + p["v"]["bias"].astype(x.dtype)
    if T >= 1024:
        # single-head spatial attention at T=H·W: the (T, T) score matrix
        # (64 MB bf16 at 512² latents) never materializes on the flash path
        from intel_extension_for_transformers_tpu.ops.flash_attention import (
            flash_attention,
        )

        ctx = flash_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :],
            causal=False,
        )[:, :, 0, :]
    else:
        att = jax.nn.softmax(
            (q @ k.transpose(0, 2, 1) / np.sqrt(C)).astype(jnp.float32),
            axis=-1,
        ).astype(x.dtype)
        ctx = att @ v
    o = ctx @ p["o"]["kernel"].astype(x.dtype) + p["o"]["bias"].astype(x.dtype)
    return x + o.reshape(B, H, W, C)


@partial(jax.jit, static_argnames=("cfg",))
def vae_encode(params, cfg: VAEConfig, images, noise=None):
    """images (B, H, W, 3) in [-1, 1] → scaled latents (B, H/8, W/8, 4).

    Deterministic (mean) unless gaussian `noise` of latent shape is given."""
    p = params["encoder"]
    x = _conv(images, p["conv_in"])
    for bi, bp in enumerate(p["down"]):
        for rp in bp["res"]:
            x = _res(x, rp, cfg.norm_groups)
        if "down" in bp:
            x = _conv(x, bp["down"], stride=2)
    x = _res(x, p["mid_res1"], cfg.norm_groups)
    x = _self_attn_2d(x, p["mid_attn"], cfg.norm_groups)
    x = _res(x, p["mid_res2"], cfg.norm_groups)
    x = _conv(jax.nn.silu(_group_norm(x, p["norm_out"], cfg.norm_groups)), p["conv_out"])
    if "quant_conv" in p:  # diffusers AutoencoderKL 1×1 moment mix
        q = p["quant_conv"]
        x = x @ q["kernel"].astype(x.dtype) + q["bias"].astype(x.dtype)
    mean, logvar = jnp.split(x, 2, axis=-1)
    if noise is not None:
        mean = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * noise
    return mean * cfg.scaling_factor


@partial(jax.jit, static_argnames=("cfg",))
def vae_decode(params, cfg: VAEConfig, latents):
    """scaled latents → images (B, H, W, 3) in [-1, 1]."""
    p = params["decoder"]
    x = latents / cfg.scaling_factor
    if "post_quant_conv" in p:  # diffusers AutoencoderKL 1×1 latent mix
        q = p["post_quant_conv"]
        x = x @ q["kernel"].astype(x.dtype) + q["bias"].astype(x.dtype)
    x = _conv(x, p["conv_in"])
    x = _res(x, p["mid_res1"], cfg.norm_groups)
    x = _self_attn_2d(x, p["mid_attn"], cfg.norm_groups)
    x = _res(x, p["mid_res2"], cfg.norm_groups)
    for bi, bp in enumerate(p["up"]):
        for rp in bp["res"]:
            x = _res(x, rp, cfg.norm_groups)
        if "up" in bp:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
            x = _conv(x, bp["up"])
    # linear output head; the [-1, 1] range comes from training, not a tanh
    return _conv(
        jax.nn.silu(_group_norm(x, p["norm_out"], cfg.norm_groups)), p["conv_out"]
    )


def _init_res(key, cin, cout):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_norm(cin),
        "conv1": _init_conv(ks[0], 3, cin, cout),
        "norm2": _init_norm(cout),
        "conv2": _init_conv(ks[1], 3, cout, cout, scale=0.2),
    }
    if cin != cout:
        p["shortcut"] = _init_conv(ks[2], 1, cin, cout)
    return p


def _init_attn(key, c):
    ks = jax.random.split(key, 4)
    d = lambda k: {  # noqa: E731
        "kernel": jax.random.normal(k, (c, c), jnp.float32) / np.sqrt(c),
        "bias": jnp.zeros((c,), jnp.float32),
    }
    return {"norm": _init_norm(c), "q": d(ks[0]), "k": d(ks[1]),
            "v": d(ks[2]), "o": d(ks[3])}


def vae_init_params(key, cfg: VAEConfig) -> dict:
    keys = iter(jax.random.split(key, 1024))
    chans = cfg.block_channels
    enc = {
        "conv_in": _init_conv(next(keys), 3, cfg.in_channels, chans[0]),
        "down": [],
        "mid_res1": _init_res(next(keys), chans[-1], chans[-1]),
        "mid_attn": _init_attn(next(keys), chans[-1]),
        "mid_res2": _init_res(next(keys), chans[-1], chans[-1]),
        "norm_out": _init_norm(chans[-1]),
        "conv_out": _init_conv(
            next(keys), 3, chans[-1], 2 * cfg.latent_channels
        ),
    }
    cin = chans[0]
    for bi, c in enumerate(chans):
        bp = {"res": []}
        for _ in range(cfg.layers_per_block):
            bp["res"].append(_init_res(next(keys), cin, c))
            cin = c
        if bi < len(chans) - 1:
            bp["down"] = _init_conv(next(keys), 3, c, c)
        enc["down"].append(bp)

    rev = list(reversed(chans))
    dec = {
        "conv_in": _init_conv(next(keys), 3, cfg.latent_channels, rev[0]),
        "mid_res1": _init_res(next(keys), rev[0], rev[0]),
        "mid_attn": _init_attn(next(keys), rev[0]),
        "mid_res2": _init_res(next(keys), rev[0], rev[0]),
        "up": [],
        "norm_out": _init_norm(rev[-1]),
        "conv_out": _init_conv(next(keys), 3, rev[-1], cfg.in_channels, scale=0.2),
    }
    cin = rev[0]
    for bi, c in enumerate(rev):
        bp = {"res": []}
        for _ in range(cfg.layers_per_block + 1):
            bp["res"].append(_init_res(next(keys), cin, c))
            cin = c
        if bi < len(rev) - 1:
            bp["up"] = _init_conv(next(keys), 3, c, c)
        dec["up"].append(bp)
    return {"encoder": enc, "decoder": dec}
