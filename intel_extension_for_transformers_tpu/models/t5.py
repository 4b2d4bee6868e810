"""T5 encoder-decoder (seq2seq) family.

Covers the reference's `AutoModelForSeq2SeqLM` export and its seq2seq
trainer/examples (reference: transformers/__init__.py:49, NLPSeq2SeqTrainer
trainer.py:2040, summarization/translation example tasks).

Architecture notes (faithful to the checkpoint format, TPU-friendly in
execution): T5 uses RMS-style LayerNorm without bias, UNscaled dot-product
attention (no 1/√d), learned relative-position bucket biases shared from
layer 0 across the stack, optional gated FFN (v1.1 "gated-gelu"), and a
d_model^-0.5 output scale when embeddings are tied. Decoding uses the same
static-slot KV cache as the decoder-only models; cross-attention K/V are
computed once per sequence at encode time.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.ops.layers import dense, rms_norm


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    feed_forward_proj: str = "relu"  # relu | gated-gelu
    tie_word_embeddings: bool = True
    decoder_start_token_id: int = 0
    pad_token_id: int = 0

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv

    @property
    def gated(self) -> bool:
        return self.feed_forward_proj.startswith("gated")

    @classmethod
    def tiny(cls, **kw):
        base = dict(
            vocab_size=256,
            d_model=64,
            d_kv=16,
            d_ff=128,
            num_layers=2,
            num_decoder_layers=2,
            num_heads=4,
            relative_attention_num_buckets=8,
            relative_attention_max_distance=32,
        )
        base.update(kw)
        return cls(**base)


def t5_config_from_hf(hc) -> T5Config:
    return T5Config(
        vocab_size=hc.vocab_size,
        d_model=hc.d_model,
        d_kv=hc.d_kv,
        d_ff=hc.d_ff,
        num_layers=hc.num_layers,
        num_decoder_layers=getattr(hc, "num_decoder_layers", hc.num_layers),
        num_heads=hc.num_heads,
        relative_attention_num_buckets=hc.relative_attention_num_buckets,
        relative_attention_max_distance=getattr(
            hc, "relative_attention_max_distance", 128
        ),
        layer_norm_eps=hc.layer_norm_epsilon,
        feed_forward_proj=hc.feed_forward_proj,
        tie_word_embeddings=getattr(hc, "tie_word_embeddings", True),
        decoder_start_token_id=hc.decoder_start_token_id or 0,
        pad_token_id=hc.pad_token_id or 0,
    )


# -------------------------------------------------------------- rel bias


def _relative_position_bucket(
    relative_position, bidirectional: bool, num_buckets: int, max_distance: int
):
    """HF-compatible bucket mapping (T5Attention._relative_position_bucket)."""
    rp = relative_position
    bucket = jnp.zeros_like(rp)
    if bidirectional:
        num_buckets //= 2
        bucket = bucket + (rp > 0).astype(jnp.int32) * num_buckets
        rp = jnp.abs(rp)
    else:
        rp = -jnp.minimum(rp, 0)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    log_ratio = jnp.log(rp.astype(jnp.float32) / max_exact + 1e-9) / np.log(
        max_distance / max_exact
    )
    large = max_exact + (log_ratio * (num_buckets - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return bucket + jnp.where(is_small, rp, large)


def _position_bias(
    rel_embedding,  # (num_buckets, num_heads)
    q_pos,  # (Tq,)
    k_pos,  # (Tk,)
    config: T5Config,
    bidirectional: bool,
):
    rp = k_pos[None, :] - q_pos[:, None]  # (Tq, Tk)
    buckets = _relative_position_bucket(
        rp,
        bidirectional,
        config.relative_attention_num_buckets,
        config.relative_attention_max_distance,
    )
    bias = jnp.take(rel_embedding, buckets, axis=0)  # (Tq, Tk, H)
    return jnp.transpose(bias, (2, 0, 1))[None]  # (1, H, Tq, Tk)


# ------------------------------------------------------------- attention


def _t5_attention(p, xq, xkv, config: T5Config, bias=None, mask=None,
                  kv_override=None):
    """T5 attention: UNscaled logits + additive position bias."""
    B, Tq, _ = xq.shape
    H, dk = config.num_heads, config.d_kv
    q = dense(xq, p["q"]["kernel"]).reshape(B, Tq, H, dk)
    if kv_override is not None:
        k, v = kv_override  # precomputed (B, Tk, H, dk)
    else:
        Tk = xkv.shape[1]
        k = dense(xkv, p["k"]["kernel"]).reshape(B, Tk, H, dk)
        v = dense(xkv, p["v"]["kernel"]).reshape(B, Tk, H, dk)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(xq.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Tq, -1)
    return dense(ctx, p["o"]["kernel"])


def _t5_ffn(p, x, config: T5Config):
    if config.gated:
        h = jax.nn.gelu(dense(x, p["wi_0"]["kernel"]), approximate=True)
        h = h * dense(x, p["wi_1"]["kernel"])
    else:
        h = jax.nn.relu(dense(x, p["wi"]["kernel"]))
    return dense(h, p["wo"]["kernel"])


# --------------------------------------------------------------- encoder


@partial(jax.jit, static_argnames=("config",))
def t5_encode(
    params: dict,
    config: T5Config,
    input_ids: jax.Array,  # (B, T)
    attention_mask: Optional[jax.Array] = None,
) -> jax.Array:
    B, T = input_ids.shape
    x = jnp.take(params["shared"], input_ids, axis=0)
    pos = jnp.arange(T)
    bias = _position_bias(
        params["encoder"]["rel_bias"], pos, pos, config, bidirectional=True
    )
    mask = (
        attention_mask.astype(bool)[:, None, None, :]
        if attention_mask is not None
        else None
    )
    for layer in params["encoder"]["layers"]:
        xn = rms_norm(x, layer["ln1"], config.layer_norm_eps)
        x = x + _t5_attention(layer["attn"], xn, xn, config, bias, mask)
        xn = rms_norm(x, layer["ln2"], config.layer_norm_eps)
        x = x + _t5_ffn(layer["ffn"], xn, config)
    return rms_norm(x, params["encoder"]["final_norm"], config.layer_norm_eps)


# --------------------------------------------------------------- decoder


@partial(jax.jit, static_argnames=("config",))
def t5_decode(
    params: dict,
    config: T5Config,
    decoder_input_ids: jax.Array,  # (B, Td)
    encoder_hidden: jax.Array,  # (B, Te, D)
    encoder_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Full (non-incremental) decoder forward → logits (B, Td, V)."""
    B, Td = decoder_input_ids.shape
    x = jnp.take(params["shared"], decoder_input_ids, axis=0)
    pos = jnp.arange(Td)
    bias = _position_bias(
        params["decoder"]["rel_bias"], pos, pos, config, bidirectional=False
    )
    causal = (jnp.arange(Td)[None, :] <= jnp.arange(Td)[:, None])[None, None]
    xmask = (
        encoder_mask.astype(bool)[:, None, None, :]
        if encoder_mask is not None
        else None
    )
    for layer in params["decoder"]["layers"]:
        xn = rms_norm(x, layer["ln1"], config.layer_norm_eps)
        x = x + _t5_attention(layer["self_attn"], xn, xn, config, bias, causal)
        xn = rms_norm(x, layer["ln2"], config.layer_norm_eps)
        x = x + _t5_attention(
            layer["cross_attn"], xn, encoder_hidden, config, None, xmask
        )
        xn = rms_norm(x, layer["ln3"], config.layer_norm_eps)
        x = x + _t5_ffn(layer["ffn"], xn, config)
    x = rms_norm(x, params["decoder"]["final_norm"], config.layer_norm_eps)
    if config.tie_word_embeddings:
        x = x * (config.d_model**-0.5)
        return jnp.einsum("btd,vd->btv", x, params["shared"])
    return dense(x, params["lm_head"]["kernel"])


def t5_apply(params, config, input_ids, decoder_input_ids,
             attention_mask=None, decoder_attention_mask=None):
    """Full seq2seq forward (parity oracle vs HF T5ForConditionalGeneration)."""
    enc = t5_encode(params, config, input_ids, attention_mask)
    return t5_decode(params, config, decoder_input_ids, enc, attention_mask)


def t5_generate(
    params,
    config: T5Config,
    input_ids,
    max_new_tokens: int = 32,
    eos_token_id: Optional[int] = 1,
    attention_mask=None,
) -> np.ndarray:
    """Greedy seq2seq generation (B, ≤max_new_tokens). Incremental decoding
    re-runs the (short) decoder prefix — fine for seq2seq output lengths;
    the encoder runs exactly once."""
    ids = jnp.asarray(input_ids)
    if ids.ndim == 1:
        ids = ids[None, :]
    B = ids.shape[0]
    enc = t5_encode(params, config, ids, attention_mask)
    dec = jnp.full((B, 1), config.decoder_start_token_id, jnp.int32)
    out = []
    finished = np.zeros((B,), bool)
    for _ in range(max_new_tokens):
        logits = t5_decode(params, config, dec, enc, attention_mask)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        tok = np.asarray(nxt)
        out.append(tok)
        if eos_token_id is not None:
            finished |= tok == eos_token_id
            if finished.all():
                break
        dec = jnp.concatenate([dec, nxt[:, None]], axis=1)
    return np.stack(out, axis=1)


# ------------------------------------------------------------------ init


def t5_init_params(rng: jax.Array, config: T5Config) -> dict:
    keys = iter(jax.random.split(rng, 512))

    def lin(k_dim, n_dim):
        return {"kernel": jax.random.normal(next(keys), (k_dim, n_dim)) * 0.02}

    def enc_layer():
        return {
            "ln1": jnp.ones((config.d_model,)),
            "attn": {
                "q": lin(config.d_model, config.inner_dim),
                "k": lin(config.d_model, config.inner_dim),
                "v": lin(config.d_model, config.inner_dim),
                "o": lin(config.inner_dim, config.d_model),
            },
            "ln2": jnp.ones((config.d_model,)),
            "ffn": (
                {
                    "wi_0": lin(config.d_model, config.d_ff),
                    "wi_1": lin(config.d_model, config.d_ff),
                    "wo": lin(config.d_ff, config.d_model),
                }
                if config.gated
                else {
                    "wi": lin(config.d_model, config.d_ff),
                    "wo": lin(config.d_ff, config.d_model),
                }
            ),
        }

    def dec_layer():
        layer = enc_layer()
        layer["self_attn"] = layer.pop("attn")
        layer["cross_attn"] = {
            "q": lin(config.d_model, config.inner_dim),
            "k": lin(config.d_model, config.inner_dim),
            "v": lin(config.d_model, config.inner_dim),
            "o": lin(config.inner_dim, config.d_model),
        }
        layer["ln3"] = layer.pop("ln2")
        layer["ln2"] = jnp.ones((config.d_model,))
        return layer

    params = {
        "shared": jax.random.normal(
            next(keys), (config.vocab_size, config.d_model)
        )
        * 0.02,
        "encoder": {
            "layers": [enc_layer() for _ in range(config.num_layers)],
            "rel_bias": jax.random.normal(
                next(keys),
                (config.relative_attention_num_buckets, config.num_heads),
            )
            * 0.02,
            "final_norm": jnp.ones((config.d_model,)),
        },
        "decoder": {
            "layers": [dec_layer() for _ in range(config.num_decoder_layers)],
            "rel_bias": jax.random.normal(
                next(keys),
                (config.relative_attention_num_buckets, config.num_heads),
            )
            * 0.02,
            "final_norm": jnp.ones((config.d_model,)),
        },
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = lin(config.d_model, config.vocab_size)
    return params


# ------------------------------------------------------------- HF convert


def t5_params_from_hf(hf_model) -> tuple[dict, T5Config]:
    """Convert a transformers T5ForConditionalGeneration."""
    config = t5_config_from_hf(hf_model.config)
    sd = {k: v for k, v in hf_model.state_dict().items()}

    def npv(key):
        t = sd[key]
        return np.asarray(t.detach().cpu().float().numpy(), np.float32)

    def lin(prefix):
        return {"kernel": jnp.asarray(npv(prefix + ".weight").T)}

    def ffn(prefix):
        if config.gated:
            return {
                "wi_0": lin(prefix + ".wi_0"),
                "wi_1": lin(prefix + ".wi_1"),
                "wo": lin(prefix + ".wo"),
            }
        return {"wi": lin(prefix + ".wi"), "wo": lin(prefix + ".wo")}

    params: dict[str, Any] = {
        "shared": jnp.asarray(npv("shared.weight")),
        "encoder": {
            "layers": [],
            "rel_bias": jnp.asarray(
                npv(
                    "encoder.block.0.layer.0.SelfAttention"
                    ".relative_attention_bias.weight"
                )
            ),
            "final_norm": jnp.asarray(npv("encoder.final_layer_norm.weight")),
        },
        "decoder": {
            "layers": [],
            "rel_bias": jnp.asarray(
                npv(
                    "decoder.block.0.layer.0.SelfAttention"
                    ".relative_attention_bias.weight"
                )
            ),
            "final_norm": jnp.asarray(npv("decoder.final_layer_norm.weight")),
        },
    }
    for li in range(config.num_layers):
        p = f"encoder.block.{li}."
        params["encoder"]["layers"].append(
            {
                "ln1": jnp.asarray(npv(p + "layer.0.layer_norm.weight")),
                "attn": {
                    "q": lin(p + "layer.0.SelfAttention.q"),
                    "k": lin(p + "layer.0.SelfAttention.k"),
                    "v": lin(p + "layer.0.SelfAttention.v"),
                    "o": lin(p + "layer.0.SelfAttention.o"),
                },
                "ln2": jnp.asarray(npv(p + "layer.1.layer_norm.weight")),
                "ffn": ffn(p + "layer.1.DenseReluDense"),
            }
        )
    for li in range(config.num_decoder_layers):
        p = f"decoder.block.{li}."
        params["decoder"]["layers"].append(
            {
                "ln1": jnp.asarray(npv(p + "layer.0.layer_norm.weight")),
                "self_attn": {
                    "q": lin(p + "layer.0.SelfAttention.q"),
                    "k": lin(p + "layer.0.SelfAttention.k"),
                    "v": lin(p + "layer.0.SelfAttention.v"),
                    "o": lin(p + "layer.0.SelfAttention.o"),
                },
                "ln2": jnp.asarray(npv(p + "layer.1.layer_norm.weight")),
                "cross_attn": {
                    "q": lin(p + "layer.1.EncDecAttention.q"),
                    "k": lin(p + "layer.1.EncDecAttention.k"),
                    "v": lin(p + "layer.1.EncDecAttention.v"),
                    "o": lin(p + "layer.1.EncDecAttention.o"),
                },
                "ln3": jnp.asarray(npv(p + "layer.2.layer_norm.weight")),
                "ffn": ffn(p + "layer.2.DenseReluDense"),
            }
        )
    if not config.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": jnp.asarray(npv("lm_head.weight").T)}
    return params, config
