"""KV-cache compression policies: H2O heavy-hitter pruning + attention sinks.

TPU-native re-derivation of the reference's long-context toolkit:
- H2O (reference: transformers/kv_cache_compression/prune/h2o.py:23-209 —
  `local_heavy_hitter_mask` accumulates attention mass per key and keeps
  heavy + recent tokens; `H2OKVCache.__call__` :138 evicts by top-k score).
- StreamingLLM attention sinks (reference: modeling_gaudi/streaming_llm.py:37
  + neural-speed shift-RoPE ring, docs/streamingllm.md:19-25): keep the first
  `sink` tokens + a recent ring, evict the oldest middle token.

TPU formulation: a **slot-based cache** — fixed (B, S, H, D) buffers plus an
explicit per-slot absolute-position array. Eviction = choosing a victim slot
and overwriting it (dynamic_update_slice), so shapes never change and the
decode program compiles once. RoPE is applied before caching, so evicting a
slot needs no re-rotation; attention masks on "slot is filled".

Both policies plug into models.generation.generate_stream via the
`kv_policy` argument (init_cache / prefill / decode_step protocol).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.llama import LlamaConfig
from intel_extension_for_transformers_tpu.models.generation import (
    SamplingConfig,
    sample_logits,
    _mark_seen,
)
from intel_extension_for_transformers_tpu.ops.layers import (
    dense,
    rms_norm,
    rotary_embedding,
    apply_rotary,
    silu,
)


@dataclass
class SlotKVCache:
    """Fixed-slot cache: k/v per layer + slot positions + H2O score accum."""

    k: list  # L × (B, S, Hkv, D)
    v: list
    positions: jax.Array  # (B, S) int32, -1 = empty
    accum: jax.Array  # (L, B, S) f32 accumulated attention mass
    next_pos: jax.Array  # scalar int32 — next absolute position


jax.tree_util.register_dataclass(
    SlotKVCache,
    data_fields=["k", "v", "positions", "accum", "next_pos"],
    meta_fields=[],
)


def _attend_slots(q, k_slots, v_slots, slot_valid):
    """q (B,T,H,D) over slot caches (B,S,Hkv,D); returns ctx and per-slot
    attention mass (B, S) summed over heads+queries (the H2O statistic)."""
    B, T, H, D = q.shape
    Hkv = k_slots.shape[2]
    if Hkv != H:
        rep = H // Hkv
        k_slots = jnp.repeat(k_slots, rep, axis=2)
        v_slots = jnp.repeat(v_slots, rep, axis=2)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k_slots, preferred_element_type=jnp.float32
    ) * (1.0 / (D**0.5))
    mask = slot_valid[:, None, None, :]
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v_slots)
    mass = jnp.sum(probs, axis=(1, 2))  # (B, S)
    return ctx, mass


def _layer_decode(layer, x, config, cos, sin, ck, cv, slot_valid, victim):
    """One decoder layer over the slot cache; writes new K/V at `victim`."""
    B, T, h = x.shape
    nh, nkv, hd = (
        config.num_attention_heads,
        config.num_key_value_heads,
        config.head_dim,
    )
    att = layer["attention"]
    xn = rms_norm(x, layer["input_norm"], config.rms_norm_eps)
    q = dense(xn, att["q"]["kernel"]).reshape(B, T, nh, hd)
    k = dense(xn, att["k"]["kernel"]).reshape(B, T, nkv, hd)
    v = dense(xn, att["v"]["kernel"]).reshape(B, T, nkv, hd)
    q = apply_rotary(q, cos, sin)
    k = apply_rotary(k, cos, sin)

    # scatter the new key/value into each batch row's victim slot
    bidx = jnp.arange(B)
    ck = ck.at[bidx, victim].set(k[:, 0].astype(ck.dtype))
    cv = cv.at[bidx, victim].set(v[:, 0].astype(cv.dtype))

    ctx, mass = _attend_slots(q, ck.astype(x.dtype), cv.astype(x.dtype), slot_valid)
    x = x + dense(ctx.reshape(B, T, h), att["o"]["kernel"])
    mlp = layer["mlp"]
    xn = rms_norm(x, layer["post_norm"], config.rms_norm_eps)
    y = silu(dense(xn, mlp["gate"]["kernel"])) * dense(xn, mlp["up"]["kernel"])
    x = x + dense(y, mlp["down"]["kernel"])
    return x, ck, cv, mass


class _SlotPolicyBase:
    """Shared prefill/decode over SlotKVCache; subclasses pick the victim."""

    def init_cache(self, config: LlamaConfig, batch: int, budget: int, dtype=jnp.bfloat16):
        budget = min(budget, self.budget)
        shape = (batch, budget, config.num_key_value_heads, config.head_dim)
        return SlotKVCache(
            k=[jnp.zeros(shape, dtype) for _ in range(config.num_hidden_layers)],
            v=[jnp.zeros(shape, dtype) for _ in range(config.num_hidden_layers)],
            positions=jnp.full((batch, budget), -1, jnp.int32),
            accum=jnp.zeros((config.num_hidden_layers, batch, budget), jnp.float32),
            next_pos=jnp.int32(0),
        )

    def prefill(self, params, config: LlamaConfig, ids: jax.Array, cache: SlotKVCache):
        """Prompt pass. Requires T ≤ budget (evict only during decode, like
        the reference H2OKVCache which prunes generated-phase cache)."""
        B, T = ids.shape
        S = cache.positions.shape[1]
        if T > S:
            raise ValueError(f"prompt length {T} exceeds KV budget {S}")
        from intel_extension_for_transformers_tpu.models.llama import (
            KVCache,
            llama_apply,
        )

        # ordinary prefill into the first T slots
        tmp = KVCache(
            k=[c[:, :T] * 0 for c in cache.k],
            v=[c[:, :T] * 0 for c in cache.v],
            length=jnp.int32(0),
        )
        logits, tmp = llama_apply(params, config, ids, tmp)
        cache = SlotKVCache(
            k=[
                jax.lax.dynamic_update_slice(c, t.astype(c.dtype), (0, 0, 0, 0))
                for c, t in zip(cache.k, tmp.k)
            ],
            v=[
                jax.lax.dynamic_update_slice(c, t.astype(c.dtype), (0, 0, 0, 0))
                for c, t in zip(cache.v, tmp.v)
            ],
            positions=cache.positions.at[:, :T].set(jnp.arange(T)[None, :]),
            accum=cache.accum,
            next_pos=jnp.int32(T),
        )
        return logits, cache

    def decode_step(self, params, config, cfg, cache, token, rng, seen):
        return _policy_decode_step(
            self, params, config, cfg, cache, token, rng, seen
        )

    def select_victim(self, cache: SlotKVCache) -> jax.Array:
        raise NotImplementedError


@partial(
    jax.jit,
    static_argnames=("policy", "config", "cfg"),
)
def _policy_decode_step(policy, params, config, cfg, cache, token, rng, seen):
    B = token.shape[0]
    S = cache.positions.shape[1]
    # victim: first empty slot if any, else policy choice
    has_empty = jnp.any(cache.positions < 0, axis=1)  # (B,)
    first_empty = jnp.argmax(cache.positions < 0, axis=1)
    chosen = policy.select_victim(cache)  # (B,)
    victim = jnp.where(has_empty, first_empty, chosen)

    positions = cache.positions.at[jnp.arange(B), victim].set(cache.next_pos)
    slot_valid = positions >= 0

    pos = jnp.broadcast_to(cache.next_pos[None, None], (B, 1))
    cos, sin = rotary_embedding(pos, config.head_dim, config.rope_theta)

    x = jnp.take(params["embed_tokens"], token[:, None], axis=0)
    new_k, new_v = [], []
    accum = cache.accum
    # decay (optional) then accumulate attention mass per slot
    for li, layer in enumerate(params["layers"]):
        x, ck, cv, mass = _layer_decode(
            layer, x, config, cos, sin, cache.k[li], cache.v[li], slot_valid, victim
        )
        new_k.append(ck)
        new_v.append(cv)
        # reset victim's stats (it holds a new token now), then add new mass
        a = accum[li].at[jnp.arange(B), victim].set(0.0)
        accum = accum.at[li].set(a + mass)
    x = rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = dense(x, params["lm_head"]["kernel"])

    rng, sub = jax.random.split(rng)
    nxt = sample_logits(logits[:, -1], sub, cfg, seen)
    seen = _mark_seen(seen, nxt)
    new_cache = SlotKVCache(
        k=new_k,
        v=new_v,
        positions=positions,
        accum=accum,
        next_pos=cache.next_pos + 1,
    )
    return nxt, new_cache, rng, seen


@dataclass(frozen=True)
class H2OKVPolicy(_SlotPolicyBase):
    """Evict the non-recent slot with the least accumulated attention
    (reference: H2OConfig heavy_ratio/recent_ratio, h2o.py:92)."""

    budget: int = 512
    recent_size: int = 64

    def select_victim(self, cache: SlotKVCache) -> jax.Array:
        # protect the `recent_size` most recent positions
        recent_floor = cache.next_pos - self.recent_size
        protected = cache.positions >= recent_floor
        score = jnp.where(protected, jnp.inf, cache.accum.sum(axis=0))
        return jnp.argmin(score, axis=1)


@dataclass(frozen=True)
class AttentionSinkKVPolicy(_SlotPolicyBase):
    """StreamingLLM: keep `sink_size` initial tokens + recent ring; evict the
    oldest non-sink slot (reference: streaming_llm.py:37 enable_streaming_llm)."""

    budget: int = 512
    sink_size: int = 4

    def select_victim(self, cache: SlotKVCache) -> jax.Array:
        protected = (cache.positions < self.sink_size) & (cache.positions >= 0)
        age = jnp.where(protected, jnp.iinfo(jnp.int32).max, cache.positions)
        return jnp.argmin(jnp.where(age < 0, jnp.iinfo(jnp.int32).max, age), axis=1)
