"""CLIP text encoder (ViT-L/14 text tower) in pure JAX.

The conditioning encoder of SD1.x (reference: image2image plugin's
text_encoder = CLIPTextModel). Pre-LN transformer with causal mask,
quick-gelu MLP, learned positions, final LayerNorm; SD consumes the last
hidden states (B, 77, 768)."""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.diffusion.unet import (
    _dense,
    _init_dense,
    _init_norm,
    _layer_norm,
)


@dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_length: int = 77

    @classmethod
    def sd15(cls) -> "ClipTextConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "ClipTextConfig":
        return cls(
            vocab_size=256, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_length=16,
        )


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@partial(jax.jit, static_argnames=("cfg",))
def clip_text_apply(params, cfg: ClipTextConfig, input_ids):
    """input_ids (B, L) → last hidden states (B, L, H)."""
    B, L = input_ids.shape
    x = jnp.take(params["token_embed"], input_ids, axis=0)
    x = x + params["pos_embed"][None, :L]
    nh, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    causal = jnp.tril(jnp.ones((L, L), bool))
    for layer in params["layers"]:
        h = _layer_norm(x, layer["ln1"])
        q = _dense(h, layer["q"]).reshape(B, L, nh, hd)
        k = _dense(h, layer["k"]).reshape(B, L, nh, hd)
        v = _dense(h, layer["v"]).reshape(B, L, nh, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        att = jnp.where(causal[None, None], att, -jnp.inf)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, L, -1)
        x = x + _dense(ctx, layer["o"])
        h = _layer_norm(x, layer["ln2"])
        x = x + _dense(_quick_gelu(_dense(h, layer["fc1"])), layer["fc2"])
    return _layer_norm(x, params["ln_final"])


def clip_text_init_params(key, cfg: ClipTextConfig) -> dict:
    keys = iter(jax.random.split(key, 256))
    H = cfg.hidden_size
    params = {
        "token_embed": jax.random.normal(
            next(keys), (cfg.vocab_size, H), jnp.float32
        ) * 0.02,
        "pos_embed": jax.random.normal(
            next(keys), (cfg.max_length, H), jnp.float32
        ) * 0.01,
        "layers": [],
        "ln_final": _init_norm(H),
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "ln1": _init_norm(H),
                "q": _init_dense(next(keys), H, H),
                "k": _init_dense(next(keys), H, H),
                "v": _init_dense(next(keys), H, H),
                "o": _init_dense(next(keys), H, H, scale=0.2),
                "ln2": _init_norm(H),
                "fc1": _init_dense(next(keys), H, cfg.intermediate_size),
                "fc2": _init_dense(next(keys), cfg.intermediate_size, H, scale=0.2),
            }
        )
    return params
