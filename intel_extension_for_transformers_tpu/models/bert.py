"""BERT-family encoder (BGE embedding models), pure-JAX functional.

The TPU-native replacement for the reference's Neural-Engine BERT deployment
and the BGE embedding encoder that powers its RAG stack
(reference: examples/huggingface/pytorch/text-embedding/deployment/mteb/bge/
engine_model.py:81-176 — tokenize → engine inference → cls-pool → normalize;
embeddings wrappers langchain_community/embeddings/embeddings.py:130-213).

Design: params are a plain nested dict; every linear weight is stored (K, N)
= (in_features, out_features) so it can be swapped for a `QuantizedTensor`
by quantization.quantize_model without touching model code — ops.layers.dense
dispatches on leaf type. Apply functions are jit-friendly (static config,
no Python branching on traced values).

Param logical axes for sharding (parallel.sharding.logical_to_sharding):
attention kernels ("embed", "heads"), MLP in ("embed", "mlp"),
MLP out ("mlp", "embed") — Megatron-style column/row parallel over `tp`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.ops.layers import (
    attention,
    dense,
    gelu,
    layer_norm,
    padding_mask,
)


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0

    @classmethod
    def tiny(cls, **kw):
        """4-layer toy config for tests (the tiny-model substitution strategy
        of reference tests/CI/test_weight_only.py:75)."""
        base = dict(
            vocab_size=1024,
            hidden_size=128,
            num_hidden_layers=4,
            num_attention_heads=4,
            intermediate_size=256,
            max_position_embeddings=128,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def bge_small(cls):
        return cls(hidden_size=384, num_hidden_layers=12, num_attention_heads=12,
                   intermediate_size=1536)

    @classmethod
    def bge_base(cls):
        return cls()

    @classmethod
    def bge_large(cls):
        return cls(hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
                   intermediate_size=4096)


def _linear_init(rng, k, n, scale=0.02):
    return {
        "kernel": jax.random.normal(rng, (k, n), jnp.float32) * scale,
        "bias": jnp.zeros((n,), jnp.float32),
    }


def bert_init_params(rng: jax.Array, config: BertConfig) -> dict:
    keys = jax.random.split(rng, config.num_hidden_layers + 2)
    h, i = config.hidden_size, config.intermediate_size
    params: dict[str, Any] = {
        "embeddings": {
            "word_embeddings": jax.random.normal(
                keys[0], (config.vocab_size, h), jnp.float32
            )
            * 0.02,
            "position_embeddings": jax.random.normal(
                keys[1], (config.max_position_embeddings, h), jnp.float32
            )
            * 0.02,
            "token_type_embeddings": jnp.zeros((config.type_vocab_size, h), jnp.float32),
            "ln_scale": jnp.ones((h,), jnp.float32),
            "ln_bias": jnp.zeros((h,), jnp.float32),
        },
        "layers": [],
        "pooler": _linear_init(keys[-1], h, h),
    }
    for li in range(config.num_hidden_layers):
        lk = jax.random.split(keys[2 + li], 6)
        params["layers"].append(
            {
                "attention": {
                    "query": _linear_init(lk[0], h, h),
                    "key": _linear_init(lk[1], h, h),
                    "value": _linear_init(lk[2], h, h),
                    "output": _linear_init(lk[3], h, h),
                    "ln_scale": jnp.ones((h,), jnp.float32),
                    "ln_bias": jnp.zeros((h,), jnp.float32),
                },
                "mlp": {
                    "intermediate": _linear_init(lk[4], h, i),
                    "output": _linear_init(lk[5], i, h),
                    "ln_scale": jnp.ones((h,), jnp.float32),
                    "ln_bias": jnp.zeros((h,), jnp.float32),
                },
            }
        )
    return params


def bert_param_axes(config: BertConfig) -> dict:
    """Logical-axis tree matching bert_init_params for parallel.shard_params."""
    la = {
        "attention": {
            "query": {"kernel": ("embed", "heads"), "bias": ("heads",)},
            "key": {"kernel": ("embed", "heads"), "bias": ("heads",)},
            "value": {"kernel": ("embed", "heads"), "bias": ("heads",)},
            "output": {"kernel": ("heads", "embed"), "bias": None},
            "ln_scale": None,
            "ln_bias": None,
        },
        "mlp": {
            "intermediate": {"kernel": ("embed", "mlp"), "bias": ("mlp",)},
            "output": {"kernel": ("mlp", "embed"), "bias": None},
            "ln_scale": None,
            "ln_bias": None,
        },
    }
    return {
        "embeddings": {
            "word_embeddings": ("vocab", "embed"),
            "position_embeddings": None,
            "token_type_embeddings": None,
            "ln_scale": None,
            "ln_bias": None,
        },
        "layers": [la] * config.num_hidden_layers,
        "pooler": {"kernel": None, "bias": None},
    }


def _encoder_layer(layer, x, mask, config: BertConfig):
    h = config.hidden_size
    nh = config.num_attention_heads
    hd = h // nh
    B, T, _ = x.shape

    att = layer["attention"]
    q = dense(x, att["query"]["kernel"], att["query"]["bias"]).reshape(B, T, nh, hd)
    k = dense(x, att["key"]["kernel"], att["key"]["bias"]).reshape(B, T, nh, hd)
    v = dense(x, att["value"]["kernel"], att["value"]["bias"]).reshape(B, T, nh, hd)
    ctx = attention(q, k, v, mask=mask).reshape(B, T, h)
    ctx = dense(ctx, att["output"]["kernel"], att["output"]["bias"])
    x = layer_norm(x + ctx, att["ln_scale"], att["ln_bias"], config.layer_norm_eps)

    mlp = layer["mlp"]
    y = dense(x, mlp["intermediate"]["kernel"], mlp["intermediate"]["bias"])
    y = gelu(y, approximate=False)
    y = dense(y, mlp["output"]["kernel"], mlp["output"]["bias"])
    return layer_norm(x + y, mlp["ln_scale"], mlp["ln_bias"], config.layer_norm_eps)


@partial(jax.jit, static_argnames=("config",))
def bert_apply(
    params: dict,
    config: BertConfig,
    input_ids: jax.Array,  # (B, T) int32
    attention_mask: Optional[jax.Array] = None,  # (B, T)
    token_type_ids: Optional[jax.Array] = None,  # (B, T)
) -> jax.Array:
    """Full encoder forward → last hidden states (B, T, H)."""
    B, T = input_ids.shape
    emb = params["embeddings"]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    positions = jnp.arange(T)[None, :]
    x = (
        jnp.take(emb["word_embeddings"], input_ids, axis=0)
        + jnp.take(emb["position_embeddings"], positions, axis=0)
        + jnp.take(emb["token_type_embeddings"], token_type_ids, axis=0)
    )
    x = layer_norm(x, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps)

    mask = padding_mask(attention_mask) if attention_mask is not None else None
    for layer in params["layers"]:
        x = _encoder_layer(layer, x, mask, config)
    return x


@partial(jax.jit, static_argnames=("config", "pooling", "normalize"))
def bert_encode(
    params: dict,
    config: BertConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    token_type_ids: Optional[jax.Array] = None,
    pooling: str = "cls",
    normalize: bool = True,
) -> jax.Array:
    """Sentence embeddings: encoder → pool → L2-normalize (B, H).

    Mirrors the reference BGE deployment exactly
    (reference: mteb/bge/engine_model.py:107-115 — cls token + normalize;
    "mean" covers sentence-transformers mean pooling).
    """
    hidden = bert_apply(params, config, input_ids, attention_mask, token_type_ids)
    if pooling == "cls":
        emb = hidden[:, 0, :]
    elif pooling == "mean":
        if attention_mask is None:
            emb = jnp.mean(hidden, axis=1)
        else:
            m = attention_mask.astype(hidden.dtype)[:, :, None]
            emb = jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    else:
        raise ValueError(f"unknown pooling {pooling!r}")
    if normalize:
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
        ).astype(emb.dtype)
    return emb


# eager (un-jitted) forward for calibration taps (models/calibration.py)
bert_apply_eager = bert_apply.__wrapped__


def bert_config_from_hf(hf_config) -> BertConfig:
    """Build from a transformers BertConfig-like object."""
    return BertConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        pad_token_id=hf_config.pad_token_id or 0,
    )
