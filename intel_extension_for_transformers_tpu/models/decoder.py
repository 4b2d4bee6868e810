"""Generic causal decoder covering the reference's model-type menu.

The reference supports ~15 decoder families through per-arch torch modules
and neural-speed C++ ports (reference: modeling_auto.py:325-347 model_type
list — gptj, gpt_neox, opt, bloom, mpt, falcon, phi, starcoder/gpt_bigcode,
chatglm, …; neural-speed per-arch graphs). TPU-native design: ONE
configurable functional decoder whose *static config flags* select the
architecture — XLA specializes the compiled program per config, so the
generality costs nothing at runtime:

- positions: rope (half-split or GPT-J interleaved, partial rotary_pct),
  learned embeddings, ALiBi, or none
- residual wiring: sequential pre-LN, parallel dual-LN (GPT-NeoX),
  parallel shared-LN (GPT-J / Falcon)
- norms: LayerNorm (±bias) or RMSNorm; optional embedding LayerNorm (BLOOM)
- MLP: plain or gated (SwiGLU); gelu/gelu_new/relu/silu
- attention: MHA/GQA/MQA via num_key_value_heads; optional proj biases

Llama-family models stay in models/llama.py (they predate this module and
are the flagship path); everything else loads here. KV caching, generation,
speculative decoding, and quantization all work unchanged: the cache struct,
`dense` dispatch, and sampling are shared.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.llama import (
    KVCache,
    _cache_write,
    _kv_quantize,
    init_kv_cache,
)
from intel_extension_for_transformers_tpu.ops.layers import (
    attention,
    dense,
    layer_norm,
    rms_norm,
)


@dataclass(frozen=True)
class DecoderConfig:
    model_type: str = "gptj"
    vocab_size: int = 50400
    hidden_size: int = 4096
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    intermediate_size: int = 16384
    max_position_embeddings: int = 2048
    # positions
    pos_embedding: str = "rope"  # rope | learned | alibi | none
    rotary_pct: float = 1.0  # fraction of head_dim rotated
    rotary_interleaved: bool = False  # GPT-J style pairs vs half-split
    rope_theta: float = 10000.0
    learned_pos_offset: int = 0  # OPT stores positions shifted by 2
    # structure
    parallel_residual: bool = False
    shared_ln: bool = False  # parallel block uses ONE ln (GPT-J/Falcon)
    norm_type: str = "layernorm"  # layernorm | rmsnorm
    norm_eps: float = 1e-5
    embedding_norm: bool = False  # BLOOM word-embedding LayerNorm
    activation: str = "gelu_new"  # gelu | gelu_new | relu | silu
    gated_mlp: bool = False
    attention_bias: bool = True
    mlp_bias: bool = True
    lm_head_bias: bool = False
    tie_word_embeddings: bool = False
    # Gemma-isms: explicit head_dim (≠ hidden/heads on gemma-7b), embeddings
    # scaled by sqrt(hidden), RMSNorm parameterized as (1 + weight)
    head_dim_override: Optional[int] = None
    embed_scale: bool = False

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.hidden_size // self.num_attention_heads

    @property
    def rotary_dim(self) -> int:
        d = int(self.head_dim * self.rotary_pct)
        return d - d % 2

    # ----------------------------------------------------- arch presets
    @classmethod
    def tiny(cls, **kw):
        base = dict(
            vocab_size=512,
            hidden_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=4,
            intermediate_size=256,
            max_position_embeddings=256,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def gptj_6b(cls):
        """(reference: released GPT-J INT4 numbers, docs/release_data.md:147)"""
        return cls(
            model_type="gptj",
            vocab_size=50400,
            hidden_size=4096,
            num_hidden_layers=28,
            num_attention_heads=16,
            num_key_value_heads=16,
            intermediate_size=16384,
            rotary_pct=64 / 256,
            rotary_interleaved=True,
            parallel_residual=True,
            shared_ln=True,
            attention_bias=False,
            lm_head_bias=True,
        )

    @classmethod
    def gpt_neox_20b(cls):
        return cls(
            model_type="gpt_neox",
            vocab_size=50432,
            hidden_size=6144,
            num_hidden_layers=44,
            num_attention_heads=64,
            num_key_value_heads=64,
            intermediate_size=24576,
            rotary_pct=0.25,
            parallel_residual=True,
        )

    @classmethod
    def opt_6_7b(cls):
        return cls(
            model_type="opt",
            vocab_size=50272,
            hidden_size=4096,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=32,
            intermediate_size=16384,
            pos_embedding="learned",
            learned_pos_offset=2,
            activation="relu",
            tie_word_embeddings=True,
        )

    @classmethod
    def bloom_7b(cls):
        return cls(
            model_type="bloom",
            vocab_size=250880,
            hidden_size=4096,
            num_hidden_layers=30,
            num_attention_heads=32,
            num_key_value_heads=32,
            intermediate_size=16384,
            pos_embedding="alibi",
            embedding_norm=True,
            tie_word_embeddings=True,
        )

    @classmethod
    def mpt_7b(cls):
        """(reference: MPT-7B INT4 numbers, docs/release_data.md:123)"""
        return cls(
            model_type="mpt",
            vocab_size=50432,
            hidden_size=4096,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=32,
            intermediate_size=16384,
            pos_embedding="alibi",
            attention_bias=False,
            mlp_bias=False,
            tie_word_embeddings=True,
        )

    @classmethod
    def falcon_7b(cls):
        """(reference: Falcon-7B INT4 numbers, docs/release_data.md:180)"""
        return cls(
            model_type="falcon",
            vocab_size=65024,
            hidden_size=4544,
            num_hidden_layers=32,
            num_attention_heads=71,
            num_key_value_heads=1,  # MQA
            intermediate_size=18176,
            parallel_residual=True,
            shared_ln=True,
            attention_bias=False,
            mlp_bias=False,
            tie_word_embeddings=True,
        )

    @classmethod
    def phi_2(cls):
        return cls(
            model_type="phi",
            vocab_size=51200,
            hidden_size=2560,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=32,
            intermediate_size=10240,
            rotary_pct=0.4,
            parallel_residual=True,
            shared_ln=True,
            lm_head_bias=True,
        )

    @classmethod
    def starcoder_15b(cls):
        return cls(
            model_type="gpt_bigcode",
            vocab_size=49152,
            hidden_size=6144,
            num_hidden_layers=40,
            num_attention_heads=48,
            num_key_value_heads=1,  # MQA
            intermediate_size=24576,
            pos_embedding="learned",
            activation="gelu_new",
            tie_word_embeddings=True,
        )


# ------------------------------------------------------------------ pieces


def _norm(x, p, config: DecoderConfig):
    if config.norm_type == "rmsnorm":
        return rms_norm(x, p["scale"], config.norm_eps)
    if config.norm_type == "rmsnorm_1p":  # Gemma zero-centered weights
        return rms_norm(x, p["scale"] + 1.0, config.norm_eps)
    bias = p.get("bias")
    if bias is None:
        bias = jnp.zeros_like(p["scale"])
    return layer_norm(x, p["scale"], bias, config.norm_eps)


def _act(x, kind: str):
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "silu":
        return jax.nn.silu(x)
    return jax.nn.gelu(x, approximate=(kind == "gelu_new"))


def _rope_tables(positions, rotary_dim, theta):
    inv = 1.0 / (theta ** (jnp.arange(0, rotary_dim, 2, jnp.float32) / rotary_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv  # (B, T, rd/2)
    return jnp.cos(ang), jnp.sin(ang)


def _apply_rope(x, cos, sin, interleaved: bool):
    """x (B, T, H, rd) — rotate; rd = cos.shape[-1]*2."""
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    if interleaved:  # GPT-J: pairs (0,1),(2,3)…
        x1, x2 = x[..., ::2], x[..., 1::2]
        out = jnp.stack([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
        return out.reshape(x.shape)
    x1, x2 = jnp.split(x, 2, axis=-1)  # NeoX/Falcon: half-split
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Standard ALiBi head slopes (powers of 2 schedule)."""

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(np.log2(n) - 3)))
        return start * (start ** np.arange(n))

    if np.log2(n_heads).is_integer():
        return pow2_slopes(n_heads).astype(np.float32)
    closest = 2 ** int(np.floor(np.log2(n_heads)))
    base = pow2_slopes(closest)
    extra = pow2_slopes(2 * closest)[0::2][: n_heads - closest]
    return np.concatenate([base, extra]).astype(np.float32)


def _decoder_layer(layer, x, config: DecoderConfig, positions, mask, bias4,
                   cache_k, cache_v, start, cache_ks=None, cache_vs=None):
    B, T, h = x.shape
    nh = config.num_attention_heads
    nkv = config.num_key_value_heads
    hd = config.head_dim

    att = layer["attention"]
    xn = _norm(x, layer["ln1"], config)

    def lin(p, width):
        return dense(xn, p["kernel"], p.get("bias")).reshape(B, T, width, hd)

    q = lin(att["q"], nh)
    k = lin(att["k"], nkv)
    v = lin(att["v"], nkv)

    if config.pos_embedding == "rope":
        rd = config.rotary_dim
        cos, sin = _rope_tables(positions, rd, config.rope_theta)
        if rd == hd:
            q = _apply_rope(q, cos, sin, config.rotary_interleaved)
            k = _apply_rope(k, cos, sin, config.rotary_interleaved)
        else:  # partial rotary (GPT-J/NeoX/Phi)
            q = jnp.concatenate(
                [_apply_rope(q[..., :rd], cos, sin, config.rotary_interleaved),
                 q[..., rd:]], axis=-1)
            k = jnp.concatenate(
                [_apply_rope(k[..., :rd], cos, sin, config.rotary_interleaved),
                 k[..., rd:]], axis=-1)

    if cache_k is not None and cache_ks is not None:
        # int8 KV (same codec as llama.py:358): quantize new rows ONCE at
        # write — per-(B,T,Hkv) symmetric scales — dequant on attend
        k8, ksc = _kv_quantize(k)
        v8, vsc = _kv_quantize(v)
        cache_k = _cache_write(cache_k, k8, start)
        cache_v = _cache_write(cache_v, v8, start)
        cache_ks = _cache_write(cache_ks, ksc, start)
        cache_vs = _cache_write(cache_vs, vsc, start)
        k_all = (cache_k.astype(jnp.float32)
                 * cache_ks[..., None]).astype(x.dtype)
        v_all = (cache_v.astype(jnp.float32)
                 * cache_vs[..., None]).astype(x.dtype)
    elif cache_k is not None:
        cache_k = _cache_write(cache_k, k, start)
        cache_v = _cache_write(cache_v, v, start)
        k_all, v_all = cache_k.astype(x.dtype), cache_v.astype(x.dtype)
    else:
        k_all, v_all = k, v

    ctx = attention(q, k_all, v_all, mask=mask, bias=bias4).reshape(
        B, T, nh * hd
    )
    attn_out = dense(ctx, att["o"]["kernel"], att["o"].get("bias"))

    mlp = layer["mlp"]
    if config.parallel_residual:
        mn = xn if config.shared_ln else _norm(x, layer["ln2"], config)
    else:
        x = x + attn_out
        mn = _norm(x, layer["ln2"], config)

    if config.gated_mlp:
        y = _act(dense(mn, mlp["gate"]["kernel"], mlp["gate"].get("bias")),
                 config.activation)
        y = y * dense(mn, mlp["up"]["kernel"], mlp["up"].get("bias"))
    else:
        y = _act(dense(mn, mlp["up"]["kernel"], mlp["up"].get("bias")),
                 config.activation)
    mlp_out = dense(y, mlp["down"]["kernel"], mlp["down"].get("bias"))

    if config.parallel_residual:
        x = x + attn_out + mlp_out
    else:
        x = x + mlp_out
    return x, cache_k, cache_v, cache_ks, cache_vs


@partial(jax.jit, static_argnames=("config",))
def decoder_apply(
    params: dict,
    config: DecoderConfig,
    input_ids: jax.Array,  # (B, T)
    cache: Optional[KVCache] = None,
    attention_mask: Optional[jax.Array] = None,
) -> tuple[jax.Array, Optional[KVCache]]:
    """Forward → (logits (B, T, V), updated cache). Same contract as
    llama_apply (models/llama.py) — generation/speculative reuse it."""
    B, T = input_ids.shape
    x = jnp.take(params["embed_tokens"], input_ids, axis=0)
    if config.embed_scale:  # Gemma: embeddings scaled by sqrt(hidden)
        x = x * jnp.asarray(config.hidden_size, jnp.float32) ** 0.5
    if config.embedding_norm:
        x = _norm(x, params["embed_norm"], config)

    start = cache.length if cache is not None else jnp.int32(0)
    if jnp.ndim(start):  # (B,) per-row fill lengths (pooled serving engine)
        positions = start[:, None] + jnp.arange(T)[None, :]
    else:
        positions = jnp.broadcast_to(start + jnp.arange(T)[None, :], (B, T))

    if config.pos_embedding == "learned":
        # OPT checkpoints store positions shifted by 2 (HF offset quirk)
        x = x + jnp.take(
            params["pos_embed"], positions + config.learned_pos_offset, axis=0
        )

    if cache is not None:
        S = cache.max_length
        ki = jnp.arange(S)[None, :]
        qi = positions[:, :, None]
        mask = (ki[:, None, :] <= qi)[:, None, :, :]
        if attention_mask is not None:
            mask = mask & attention_mask.astype(bool)[:, None, None, :S]
    else:
        S = T
        mask = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])[None, None]
        if attention_mask is not None:
            mask = mask & attention_mask.astype(bool)[:, None, None, :T]

    bias4 = None
    if config.pos_embedding == "alibi":
        slopes = jnp.asarray(alibi_slopes(config.num_attention_heads))
        key_pos = jnp.arange(S)[None, None, None, :]  # (1,1,1,S)
        qpos = positions[:, None, :, None]  # (B,1,T,1)
        dist = key_pos - qpos  # ≤ 0 on the causal part
        bias4 = slopes[None, :, None, None] * dist  # (B, H, T, S)

    quant = cache is not None and cache.k_scale is not None
    new_k, new_v, new_ks, new_vs = [], [], [], []
    for li, layer in enumerate(params["layers"]):
        ck = cache.k[li] if cache is not None else None
        cv = cache.v[li] if cache is not None else None
        cks = cache.k_scale[li] if quant else None
        cvs = cache.v_scale[li] if quant else None
        x, ck, cv, cks, cvs = _decoder_layer(
            layer, x, config, positions, mask, bias4, ck, cv, start,
            cks, cvs,
        )
        new_k.append(ck)
        new_v.append(cv)
        new_ks.append(cks)
        new_vs.append(cvs)

    x = _norm(x, params["final_norm"], config)
    logits = dense(x, params["lm_head"]["kernel"], params["lm_head"].get("bias"))

    new_cache = None
    if cache is not None:
        new_cache = KVCache(
            k=new_k, v=new_v, length=cache.length + T,
            k_scale=new_ks if quant else None,
            v_scale=new_vs if quant else None,
        )
    return logits, new_cache


decoder_apply_eager = decoder_apply.__wrapped__


# ------------------------------------------------------------------- init


def _lin_init(rng, k, n, bias: bool, scale=0.02):
    p = {"kernel": jax.random.normal(rng, (k, n), jnp.float32) * scale}
    if bias:
        p["bias"] = jnp.zeros((n,), jnp.float32)
    return p


def _norm_init(h, config: DecoderConfig):
    p = {"scale": jnp.ones((h,), jnp.float32)}
    if config.norm_type != "rmsnorm":
        p["bias"] = jnp.zeros((h,), jnp.float32)
    return p


def decoder_init_params(rng: jax.Array, config: DecoderConfig) -> dict:
    keys = jax.random.split(rng, config.num_hidden_layers + 3)
    h = config.hidden_size
    i = config.intermediate_size
    hd, nh, nkv = config.head_dim, config.num_attention_heads, config.num_key_value_heads
    params: dict[str, Any] = {
        "embed_tokens": jax.random.normal(keys[0], (config.vocab_size, h)) * 0.02,
        "layers": [],
        "final_norm": _norm_init(h, config),
    }
    if config.pos_embedding == "learned":
        params["pos_embed"] = (
            jax.random.normal(keys[1], (config.max_position_embeddings, h)) * 0.02
        )
    if config.embedding_norm:
        params["embed_norm"] = _norm_init(h, config)
    params["lm_head"] = {
        "kernel": (
            params["embed_tokens"].T
            if config.tie_word_embeddings
            else jax.random.normal(keys[2], (h, config.vocab_size)) * 0.02
        )
    }
    if config.lm_head_bias:
        params["lm_head"]["bias"] = jnp.zeros((config.vocab_size,), jnp.float32)

    ab, mb = config.attention_bias, config.mlp_bias
    for li in range(config.num_hidden_layers):
        lk = jax.random.split(keys[3 + li], 7)
        layer = {
            "ln1": _norm_init(h, config),
            "attention": {
                "q": _lin_init(lk[0], h, nh * hd, ab),
                "k": _lin_init(lk[1], h, nkv * hd, ab),
                "v": _lin_init(lk[2], h, nkv * hd, ab),
                "o": _lin_init(lk[3], nh * hd, h, ab),
            },
            "mlp": {
                "up": _lin_init(lk[4], h, i, mb),
                "down": _lin_init(lk[5], i, h, mb),
            },
        }
        if config.gated_mlp:
            layer["mlp"]["gate"] = _lin_init(lk[6], h, i, mb)
        if not (config.parallel_residual and config.shared_ln):
            layer["ln2"] = _norm_init(h, config)
        params["layers"].append(layer)
    return params


def decoder_param_axes(config: DecoderConfig) -> dict:
    """Logical sharding axes (tp over heads/mlp) for parallel.shard_params."""
    ab, mb = config.attention_bias, config.mlp_bias
    lin_a = lambda: {"kernel": ("embed", "heads"), **({"bias": ("heads",)} if ab else {})}
    lin_o = lambda: {"kernel": ("heads", "embed"), **({"bias": None} if ab else {})}
    nrm = {"scale": None} if config.norm_type == "rmsnorm" else {
        "scale": None, "bias": None}
    la = {
        "ln1": dict(nrm),
        "attention": {"q": lin_a(), "k": lin_a(), "v": lin_a(), "o": lin_o()},
        "mlp": {
            "up": {"kernel": ("embed", "mlp"), **({"bias": ("mlp",)} if mb else {})},
            "down": {"kernel": ("mlp", "embed"), **({"bias": None} if mb else {})},
        },
    }
    if config.gated_mlp:
        la["mlp"]["gate"] = {
            "kernel": ("embed", "mlp"), **({"bias": ("mlp",)} if mb else {})
        }
    if not (config.parallel_residual and config.shared_ln):
        la["ln2"] = dict(nrm)
    axes: dict[str, Any] = {
        "embed_tokens": ("vocab", "embed"),
        "layers": [la] * config.num_hidden_layers,
        "final_norm": dict(nrm),
        "lm_head": {
            "kernel": ("embed", "vocab"),
            **({"bias": ("vocab",)} if config.lm_head_bias else {}),
        },
    }
    if config.pos_embedding == "learned":
        axes["pos_embed"] = None
    if config.embedding_norm:
        axes["embed_norm"] = dict(nrm)
    return axes
