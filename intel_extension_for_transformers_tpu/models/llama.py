"""Llama-family decoder (Llama/Mistral-class: RMSNorm, RoPE, GQA, SwiGLU).

TPU-native replacement for the reference's LLM Runtime decoders
(reference: neural-speed INT4 llama path consumed at
modeling/modeling_auto.py:812-827, and the Gaudi static-shape generation port
modeling/modeling_gaudi/generation/utils.py). Key TPU choices:

- **Static-shape KV cache**: a preallocated (B, S_max, Hkv, D) buffer per
  layer with a scalar `length`; decode writes via dynamic_update_slice. This
  is the same bucketed-static-shapes idea the reference uses on Gaudi
  (generation/utils.py:88-110) — XLA compiles one prefill and one decode
  program, no recompiles per token.
- Params are plain dicts; linear weights are (K, N) leaves swappable for
  QuantizedTensor (INT4 decode = the reference's neural-speed INT4 role).
- GQA via head repetition inside ops.layers.attention.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.ops.layers import (
    attention,
    dense,
    rms_norm,
    rotary_embedding,
    apply_rotary,
    silu,
)


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    intermediate_size: int = 11008
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    # long-context RoPE scaling (ops/layers.rope_inv_freq): None,
    # ("linear", factor), or ("llama3", factor, low_f, high_f, orig_max)
    rope_scaling: Optional[tuple] = None
    # Mistral-style sliding-window attention: keys older than `window`
    # positions are masked out (None = global attention)
    sliding_window: Optional[int] = None
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    # Mixture-of-Experts (Mixtral family): 0 = dense MLP
    num_local_experts: int = 0
    num_experts_per_tok: int = 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw):
        base = dict(
            vocab_size=512,
            hidden_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            intermediate_size=256,
            max_position_embeddings=256,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def llama2_7b(cls):
        return cls()

    @classmethod
    def mixtral_8x7b(cls):
        return cls(
            vocab_size=32000,
            hidden_size=4096,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=8,
            intermediate_size=14336,
            max_position_embeddings=32768,
            rope_theta=1e6,
            num_local_experts=8,
            num_experts_per_tok=2,
        )

    @classmethod
    def llama3_8b(cls):
        return cls(
            vocab_size=128256,
            num_key_value_heads=8,
            intermediate_size=14336,
            rope_theta=500000.0,
            max_position_embeddings=8192,
        )

    @classmethod
    def llama31_8b(cls):
        """Llama-3.1: 128k context via the llama3 RoPE scaling scheme."""
        return cls(
            vocab_size=128256,
            num_key_value_heads=8,
            intermediate_size=14336,
            rope_theta=500000.0,
            max_position_embeddings=131072,
            rope_scaling=("llama3", 8.0, 1.0, 4.0, 8192.0),
        )


def _rope_scaling_from_hf(hf_config) -> Optional[tuple]:
    """HF rope_scaling dict → our hashable spec (None for unsupported/none)."""
    rs = getattr(hf_config, "rope_scaling", None)
    if not rs:
        return None
    kind = rs.get("rope_type") or rs.get("type")
    if kind == "linear":
        return ("linear", float(rs["factor"]))
    if kind == "llama3":
        return (
            "llama3",
            float(rs["factor"]),
            float(rs["low_freq_factor"]),
            float(rs["high_freq_factor"]),
            float(rs["original_max_position_embeddings"]),
        )
    raise ValueError(f"unsupported rope_scaling type {kind!r}")


def llama_config_from_hf(hf_config) -> LlamaConfig:
    pr = float(getattr(hf_config, "partial_rotary_factor", 1.0) or 1.0)
    if pr != 1.0:
        raise ValueError(
            "llama-family path rotates the full head_dim; "
            f"partial_rotary_factor={pr} checkpoints belong to the generic "
            "decoder (models/decoder.py rotary_pct)"
        )
    return LlamaConfig(
        num_local_experts=getattr(hf_config, "num_local_experts", 0),
        num_experts_per_tok=getattr(hf_config, "num_experts_per_tok", 2),
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        num_key_value_heads=getattr(
            hf_config, "num_key_value_heads", hf_config.num_attention_heads
        ),
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rope_scaling=_rope_scaling_from_hf(hf_config),
        sliding_window=_sliding_window_from_hf(hf_config),
        rms_norm_eps=hf_config.rms_norm_eps,
        tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
    )


def _sliding_window_from_hf(hf_config) -> Optional[int]:
    """Mistral: sliding_window (None = global); Qwen2 additionally gates it
    behind use_sliding_window (off by default)."""
    sw = getattr(hf_config, "sliding_window", None)
    if sw is not None and not getattr(hf_config, "use_sliding_window", True):
        sw = None
    return int(sw) if sw else None


def _linear_init(rng, k, n, scale=0.02):
    return {"kernel": jax.random.normal(rng, (k, n), jnp.float32) * scale}


def llama_init_params(rng: jax.Array, config: LlamaConfig) -> dict:
    h = config.hidden_size
    kvh = config.num_key_value_heads * config.head_dim
    keys = jax.random.split(rng, config.num_hidden_layers + 3)
    params: dict[str, Any] = {
        "embed_tokens": jax.random.normal(keys[0], (config.vocab_size, h)) * 0.02,
        "layers": [],
        "final_norm": jnp.ones((h,), jnp.float32),
        "lm_head": _linear_init(keys[1], h, config.vocab_size),
    }
    for li in range(config.num_hidden_layers):
        lk = jax.random.split(keys[2 + li], 8)
        i_sz, E = config.intermediate_size, config.num_local_experts
        if E > 0:  # Mixtral MoE block: stacked per-expert projections
            mlp = {
                "router": _linear_init(lk[4], h, E),
                "experts": {
                    "gate": jax.random.normal(lk[5], (E, h, i_sz)) * 0.02,
                    "up": jax.random.normal(lk[6], (E, h, i_sz)) * 0.02,
                    "down": jax.random.normal(lk[7], (E, i_sz, h)) * 0.02,
                },
            }
        else:
            mlp = {
                "gate": _linear_init(lk[4], h, i_sz),
                "up": _linear_init(lk[5], h, i_sz),
                "down": _linear_init(lk[6], i_sz, h),
            }
        params["layers"].append(
            {
                "input_norm": jnp.ones((h,), jnp.float32),
                "attention": {
                    "q": _linear_init(lk[0], h, h),
                    "k": _linear_init(lk[1], h, kvh),
                    "v": _linear_init(lk[2], h, kvh),
                    "o": _linear_init(lk[3], h, h),
                },
                "post_norm": jnp.ones((h,), jnp.float32),
                "mlp": mlp,
            }
        )
    return params


def llama_param_axes(config: LlamaConfig) -> dict:
    la = {
        "input_norm": None,
        "attention": {
            "q": {"kernel": ("embed", "heads")},
            "k": {"kernel": ("embed", "kv")},
            "v": {"kernel": ("embed", "kv")},
            "o": {"kernel": ("heads", "embed")},
        },
        "post_norm": None,
        "mlp": (
            {
                "router": {"kernel": None},
                "experts": {
                    "gate": ("expert", "embed", "mlp"),
                    "up": ("expert", "embed", "mlp"),
                    "down": ("expert", "mlp", "embed"),
                },
            }
            if config.num_local_experts > 0
            else {
                "gate": {"kernel": ("embed", "mlp")},
                "up": {"kernel": ("embed", "mlp")},
                "down": {"kernel": ("mlp", "embed")},
            }
        ),
    }
    return {
        "embed_tokens": ("vocab", "embed"),
        "layers": [la] * config.num_hidden_layers,
        "final_norm": None,
        "lm_head": {"kernel": ("embed", "vocab")},
    }


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


@dataclass
class KVCache:
    """Static-shape per-layer KV buffers + scalar fill length.

    With k_scale/v_scale set (init_kv_cache(dtype="int8")) the buffers hold
    per-vector symmetric INT8 with one scale per (B, S, Hkv) — half the KV
    HBM of bf16, so a serving pool fits ~2× the slots/context. Quantization
    happens once at write time; reads dequantize into the attention einsum.
    Beyond the reference (its runtimes keep fp16/bf16 KV).
    """

    k: list  # num_layers × (B, S, Hkv, D)
    v: list
    length: jax.Array  # scalar int32
    k_scale: Optional[list] = None  # int8 mode: num_layers × (B, S, Hkv) f32
    v_scale: Optional[list] = None

    @property
    def max_length(self) -> int:
        return self.k[0].shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


jax.tree_util.register_dataclass(
    KVCache,
    data_fields=["k", "v", "length", "k_scale", "v_scale"],
    meta_fields=[],
)


def init_kv_cache(
    config: LlamaConfig, batch: int, max_length: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (batch, max_length, config.num_key_value_heads, config.head_dim)
    L = config.num_hidden_layers
    if dtype in ("int8", jnp.int8):
        return KVCache(
            k=[jnp.zeros(shape, jnp.int8) for _ in range(L)],
            v=[jnp.zeros(shape, jnp.int8) for _ in range(L)],
            length=jnp.int32(0),
            k_scale=[jnp.zeros(shape[:-1], jnp.float32) for _ in range(L)],
            v_scale=[jnp.zeros(shape[:-1], jnp.float32) for _ in range(L)],
        )
    return KVCache(
        k=[jnp.zeros(shape, dtype) for _ in range(L)],
        v=[jnp.zeros(shape, dtype) for _ in range(L)],
        length=jnp.int32(0),
    )


def _kv_quantize(t: jax.Array):
    """(B, T, H, D) float → (int8 codes, (B, T, H) f32 scales)."""
    sc = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1) / 127.0
    q = jnp.round(t.astype(jnp.float32) / jnp.maximum(sc[..., None], 1e-8))
    return jnp.clip(q, -127, 127).astype(jnp.int8), sc


def _cache_write(buf, new, start):
    """Write `new` (B, T, ...) into `buf` (B, S, ...) at rows
    [start, start+T). Scalar `start`: one dynamic_update_slice (prefill /
    batched generate — every row at the same offset). Vector `start` (B,):
    per-row offsets — the pooled serving engine decodes a slot pool with
    heterogeneous fill lengths in ONE batched step, so the weight matmuls
    see M=B and the int4 weights stream from HBM once per step instead of
    once per slot (vmapping the whole forward re-reads them B times)."""
    new = new.astype(buf.dtype)
    if jnp.ndim(start) == 0:
        idx = (jnp.int32(0), start) + (jnp.int32(0),) * (buf.ndim - 2)
        return jax.lax.dynamic_update_slice(buf, new, idx)
    B, T = new.shape[:2]
    rows = start[:, None] + jnp.arange(T)[None, :]  # (B, T)
    return buf.at[jnp.arange(B)[:, None], rows].set(new)


def _decoder_layer(layer, x, config: LlamaConfig, cos, sin, mask, cache_k,
                   cache_v, start, use_flash: bool = False, ring=None,
                   cache_ks=None, cache_vs=None):
    B, T, h = x.shape
    nh = config.num_attention_heads
    nkv = config.num_key_value_heads
    hd = config.head_dim

    att = layer["attention"]
    xn = rms_norm(x, layer["input_norm"], config.rms_norm_eps)
    # .get("bias"): Qwen2-style checkpoints carry QKV biases, Llama does not
    q = dense(xn, att["q"]["kernel"], att["q"].get("bias")).reshape(B, T, nh, hd)
    k = dense(xn, att["k"]["kernel"], att["k"].get("bias")).reshape(B, T, nkv, hd)
    v = dense(xn, att["v"]["kernel"], att["v"].get("bias")).reshape(B, T, nkv, hd)
    q = apply_rotary(q, cos, sin)
    k = apply_rotary(k, cos, sin)

    if cache_k is not None and cache_ks is not None:
        # int8 KV: quantize the new rows ONCE at write; dequant on attend
        k8, ksc = _kv_quantize(k)
        v8, vsc = _kv_quantize(v)
        cache_k = _cache_write(cache_k, k8, start)
        cache_v = _cache_write(cache_v, v8, start)
        cache_ks = _cache_write(cache_ks, ksc, start)
        cache_vs = _cache_write(cache_vs, vsc, start)
        k_all = (cache_k.astype(jnp.float32) * cache_ks[..., None]).astype(x.dtype)
        v_all = (cache_v.astype(jnp.float32) * cache_vs[..., None]).astype(x.dtype)
    elif cache_k is not None:
        # write new K/V at [start, start+T); attend over the whole buffer
        cache_k = _cache_write(cache_k, k, start)
        cache_v = _cache_write(cache_v, v, start)
        k_all, v_all = cache_k.astype(x.dtype), cache_v.astype(x.dtype)
    else:
        k_all, v_all = k, v

    if ring is not None:
        # sequence-parallel exact attention: T shards over the mesh `sp`
        # axis, K/V blocks rotate the ICI ring (ops/ring_attention.py)
        from intel_extension_for_transformers_tpu.ops.ring_attention import (
            ring_attention,
        )

        if nkv != nh:  # GQA: ring kernel attends per-head, repeat KV
            k_all = jnp.repeat(k_all, nh // nkv, axis=2)
            v_all = jnp.repeat(v_all, nh // nkv, axis=2)
        ctx = ring_attention(
            q, k_all, v_all, mesh=ring[0], axis=ring[1], causal=True
        ).reshape(B, T, h)
    elif use_flash:
        from intel_extension_for_transformers_tpu.ops.flash_attention import (
            flash_attention,
        )

        ctx = flash_attention(q, k_all, v_all, causal=True).reshape(B, T, h)
    else:
        ctx = attention(q, k_all, v_all, mask=mask).reshape(B, T, h)
    x = x + dense(ctx, att["o"]["kernel"])

    mlp = layer["mlp"]
    xn = rms_norm(x, layer["post_norm"], config.rms_norm_eps)
    if "router" in mlp:  # Mixture-of-Experts block (Mixtral family)
        x = x + _moe_mlp(mlp, xn, config)
    else:
        y = silu(dense(xn, mlp["gate"]["kernel"])) * dense(xn, mlp["up"]["kernel"])
        x = x + dense(y, mlp["down"]["kernel"])
    return x, cache_k, cache_v, cache_ks, cache_vs


def _moe_mlp(mlp, x, config: LlamaConfig):
    """Top-k routed expert MLP via grouped (ragged) matmuls.

    Reference coverage: Mixtral support (gaudi port modeling_gaudi/models/
    mixtral + neural-speed mixtral graph). TPU-native execution: tokens are
    SORTED by assigned expert and each expert's contiguous run hits the MXU
    through one `lax.ragged_dot` per projection — compute is Σ tokens·k, not
    tokens·E (no dense all-experts waste, no capacity-overflow drops)."""
    B, T, H = x.shape
    E, k = config.num_local_experts, config.num_experts_per_tok
    xt = x.reshape(-1, H)
    M = xt.shape[0]

    router_logits = dense(xt, mlp["router"]["kernel"]).astype(jnp.float32)
    probs = jax.nn.softmax(router_logits, axis=-1)
    weights, experts = jax.lax.top_k(probs, k)  # (M, k)
    weights = weights / jnp.maximum(
        jnp.sum(weights, axis=-1, keepdims=True), 1e-9
    )  # renormalize over the selected experts (Mixtral)

    ex = mlp["experts"]

    def stack(w):
        # WOQ expert stacks ((E, K, N) int4/int8, quantize_groupwise_stacked)
        # dequantize into the ragged_dot operand; the memory win is at rest
        from intel_extension_for_transformers_tpu.ops.packing import (
            QuantizedTensor,
            dequantize_stacked,
        )

        if isinstance(w, QuantizedTensor):
            return dequantize_stacked(w, dtype=x.dtype)
        return w.astype(x.dtype)

    import os as _os

    # NOTE: ITX_MOE_DENSE_DECODE is TRACE-TIME (process-level): it is read
    # while jit traces this function, so flipping it after a program has
    # compiled has no effect in that process — set it before first use
    # (benchmarks run each variant in its own subprocess for this reason).
    if M * k < E and not _os.environ.get("ITX_MOE_DENSE_DECODE"):
        # single/few-stream decode: GATHER only the selected experts'
        # (packed) weight blocks instead of streaming all E. Decode is
        # HBM-bound, so this cuts per-token expert traffic to k/E of the
        # dense-all-experts path (4x for Mixtral top-2-of-8 at M=1). The
        # gather is a whole-block take on the leading expert dim —
        # contiguous DMA (see CLAUDE.md gather-granularity note).
        from intel_extension_for_transformers_tpu.ops.packing import (
            QuantizedTensor,
        )
        from dataclasses import replace as _replace

        def pick(w, e_idx):
            # dynamic-index ONE expert's block out of the stack; a packed
            # QuantizedTensor stays packed — `dense` routes it through the
            # Pallas WOQ kernel, which decodes nibbles in VMEM (no (K, N)
            # bf16 materialization in HBM, unlike dequantize_stacked)
            if isinstance(w, QuantizedTensor):
                if w.pre_scale is not None:
                    # pre_scale's contract is per-K (K,), not per-expert;
                    # a stacked (E, K) variant is not defined (the dense
                    # and ragged paths drop it entirely) — refuse rather
                    # than slice it along K silently (ADVICE r3)
                    raise ValueError(
                        "stacked expert QuantizedTensor must not carry "
                        "pre_scale; fold it into scales at pack time"
                    )
                sel = lambda a: (  # noqa: E731
                    None if a is None
                    else jax.lax.dynamic_index_in_dim(a, e_idx, 0, False)
                )
                return _replace(w, data=sel(w.data), scales=sel(w.scales),
                                zeros=sel(w.zeros))
            return jax.lax.dynamic_index_in_dim(w, e_idx, 0, False)

        outs = []
        for m in range(M):  # M·k < E ≤ a handful: unrolled at trace time
            x_m = jax.lax.dynamic_slice_in_dim(xt, m, 1, 0)  # (1, H)
            acc = jnp.zeros((1, H), jnp.float32)
            for j in range(k):
                e_idx = experts[m, j]
                g = dense(x_m, pick(ex["gate"], e_idx))
                u = dense(x_m, pick(ex["up"], e_idx))
                y = (jax.nn.silu(g.astype(jnp.float32))
                     * u.astype(jnp.float32)).astype(x.dtype)
                o = dense(y, pick(ex["down"], e_idx))
                acc = acc + o.astype(jnp.float32) * weights[m, j]
            outs.append(acc)
        out = jnp.concatenate(outs, axis=0)  # (M, H)
        return out.astype(x.dtype).reshape(B, T, H)

    if M <= 8:
        # decode-size dense path: run ALL experts on the few tokens and
        # weight by the (renormalized) top-k routing probs. At M this small
        # the E tiny matmuls cost less than ragged_dot's sort machinery
        # (the serving engine's pooled decode step lands here with M = pool
        # slots; larger pools take the ragged_dot path below)
        w_full = jnp.zeros((M, E), jnp.float32).at[
            jnp.arange(M)[:, None], experts
        ].set(weights)  # (M, E) — zero for unselected experts
        g = jnp.einsum("mh,ehf->emf", xt, stack(ex["gate"]),
                       preferred_element_type=jnp.float32)
        u = jnp.einsum("mh,ehf->emf", xt, stack(ex["up"]),
                       preferred_element_type=jnp.float32)
        y = (jax.nn.silu(g) * u).astype(x.dtype)
        o = jnp.einsum("emf,efh->emh", y, stack(ex["down"]),
                       preferred_element_type=jnp.float32)  # (E, M, H)
        out = jnp.einsum("emh,me->mh", o, w_full)
        return out.astype(x.dtype).reshape(B, T, H)

    flat_expert = experts.reshape(-1)  # (M·k,)
    order = jnp.argsort(flat_expert)  # group tokens by expert
    token_of = order // k  # source token per sorted slot
    xs = jnp.take(xt, token_of, axis=0)  # (M·k, H)
    group_sizes = jnp.bincount(flat_expert, length=E).astype(jnp.int32)

    g = jax.lax.ragged_dot(
        xs, stack(ex["gate"]), group_sizes,
        preferred_element_type=jnp.float32,
    )
    u = jax.lax.ragged_dot(
        xs, stack(ex["up"]), group_sizes,
        preferred_element_type=jnp.float32,
    )
    y = (jax.nn.silu(g) * u).astype(x.dtype)
    y = jax.lax.ragged_dot(
        y, stack(ex["down"]), group_sizes,
        preferred_element_type=jnp.float32,
    )  # (M·k, H) f32

    w_sorted = jnp.take(weights.reshape(-1), order)  # routing weight per slot
    out = jnp.zeros((M, H), jnp.float32).at[token_of].add(y * w_sorted[:, None])
    return out.astype(x.dtype).reshape(B, T, H)


@partial(jax.jit, static_argnames=("config", "ring_mesh", "ring_axis", "remat"))
def llama_apply(
    params: dict,
    config: LlamaConfig,
    input_ids: jax.Array,  # (B, T)
    cache: Optional[KVCache] = None,
    attention_mask: Optional[jax.Array] = None,  # (B, S_total) 1=valid
    *,
    ring_mesh=None,  # jax.sharding.Mesh → ring-attention SP training forward
    ring_axis: str = "sp",
    remat: bool = False,  # jax.checkpoint each layer: O(1)-activations grads
) -> tuple[jax.Array, Optional[KVCache]]:
    """Forward → (logits (B, T, V), updated cache).

    Without cache: plain causal forward (training / scoring).
    With cache: writes K/V at [cache.length, cache.length+T) and attends over
    the full static buffer with position masking — same program for prefill
    (T=prompt) and decode (T=1).
    With ring_mesh (no cache, no attention_mask): sequence-parallel training
    forward — shard input_ids' T axis over `ring_axis` and every layer's
    attention runs the K/V-rotating ring over ICI (ops/ring_attention.py);
    no (T, T) mask or score matrix is ever materialized, so contexts scale
    P× past one chip's memory. Beyond the reference (SURVEY §2.3: SP absent).
    """
    B, T = input_ids.shape
    x = jnp.take(params["embed_tokens"], input_ids, axis=0)

    start = cache.length if cache is not None else jnp.int32(0)
    if jnp.ndim(start):  # (B,) per-row fill lengths (pooled serving engine)
        positions = start[:, None] + jnp.arange(T)[None, :]  # (B, T)
    else:
        positions = jnp.broadcast_to(start + jnp.arange(T)[None, :], (B, T))
    cos, sin = rotary_embedding(
        positions, config.head_dim, config.rope_theta, config.rope_scaling
    )

    ring = None
    if ring_mesh is not None:
        if cache is not None or attention_mask is not None:
            raise ValueError(
                "ring-attention SP is a training/scoring forward: "
                "cache and attention_mask must be None"
            )
        if config.sliding_window is not None:
            raise ValueError("ring-attention SP is global-causal only")
        ring = (ring_mesh, ring_axis)
        mask = None
    elif cache is not None:
        S = cache.max_length
        ki = jnp.arange(S)[None, :]  # (1, S)
        qi = positions[:, :, None]  # (B, T, 1)
        mask = ki[:, None, :] <= qi  # (B, T, S) causal over absolute positions
        if config.sliding_window is not None:
            mask = mask & (qi - ki[:, None, :] < config.sliding_window)
        mask = mask[:, None, :, :]  # (B, 1, T, S)
        if attention_mask is not None:
            pad = attention_mask.astype(bool)
            mask = mask & pad[:, None, None, :S]
    else:
        qi = jnp.arange(T)[:, None]
        ki = jnp.arange(T)[None, :]
        causal = ki <= qi
        if config.sliding_window is not None:
            causal = causal & (qi - ki < config.sliding_window)
        mask = causal[None, None, :, :]
        if attention_mask is not None:
            mask = mask & attention_mask.astype(bool)[:, None, None, :T]

    # long no-cache (training / scoring) forwards route to the Pallas flash
    # kernel: O(T) memory, ~2.4× over the fused XLA attention at T=4096
    # (the kernel is global-causal, so windowed configs stay on the XLA path)
    import os

    use_flash = (
        ring is None
        and cache is None
        and attention_mask is None
        and config.sliding_window is None
        and T >= 1024
        and os.environ.get("ITX_DISABLE_FLASH", "0") == "0"
    )

    quant = cache is not None and cache.quantized

    def run_layer(layer, x, cos, sin, mask, ck, cv, start, cks, cvs):
        return _decoder_layer(
            layer, x, config, cos, sin, mask, ck, cv, start, use_flash, ring,
            cks, cvs,
        )

    if remat:
        # rematerialize each layer in the backward pass — activation memory
        # drops from O(L·B·T·H) to O(B·T·H) at ~1.3× the backward FLOPs
        # (the TPU HBM-for-FLOPs trade; reference analogue: HF
        # gradient_checkpointing in the finetuning configs)
        run_layer = jax.checkpoint(run_layer)

    new_k, new_v, new_ks, new_vs = [], [], [], []
    for li, layer in enumerate(params["layers"]):
        ck = cache.k[li] if cache is not None else None
        cv = cache.v[li] if cache is not None else None
        cks = cache.k_scale[li] if quant else None
        cvs = cache.v_scale[li] if quant else None
        x, ck, cv, cks, cvs = run_layer(
            layer, x, cos, sin, mask, ck, cv, start, cks, cvs
        )
        new_k.append(ck)
        new_v.append(cv)
        new_ks.append(cks)
        new_vs.append(cvs)

    x = rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = dense(x, params["lm_head"]["kernel"])

    new_cache = None
    if cache is not None:
        new_cache = KVCache(
            k=new_k, v=new_v, length=cache.length + T,
            k_scale=new_ks if quant else None,
            v_scale=new_vs if quant else None,
        )
    return logits, new_cache


# eager (un-jitted) forward: needed by calibration taps
# (models/calibration.py TapKernel records Python-side during the trace-free run)
llama_apply_eager = llama_apply.__wrapped__


@partial(jax.jit, static_argnames=("config",))
def llama_apply_with_hidden(
    params: dict,
    config: LlamaConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Forward → (logits, final-norm hidden states (B, T, H)).

    Used by value-head models (PPO) that need representations alongside
    logits (reference: trl_models/modeling_value_head.py)."""
    B, T = input_ids.shape
    x = jnp.take(params["embed_tokens"], input_ids, axis=0)
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    cos, sin = rotary_embedding(
        positions, config.head_dim, config.rope_theta, config.rope_scaling
    )
    qi = jnp.arange(T)[:, None]
    ki = jnp.arange(T)[None, :]
    causal = ki <= qi
    if config.sliding_window is not None:
        causal = causal & (qi - ki < config.sliding_window)
    mask = causal[None, None, :, :]
    if attention_mask is not None:
        mask = mask & attention_mask.astype(bool)[:, None, None, :T]
    for layer in params["layers"]:
        x, _, _, _, _ = _decoder_layer(
            layer, x, config, cos, sin, mask, None, None, jnp.int32(0)
        )
    hidden = rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = dense(hidden, params["lm_head"]["kernel"])
    return logits, hidden
