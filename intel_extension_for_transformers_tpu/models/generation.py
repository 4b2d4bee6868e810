"""Autoregressive generation: sampling, streaming, compiled decode loops.

TPU-native replacement for the reference's generation paths
(reference: neural_chat/models/model_utils.py:1061 `predict_stream` —
threaded TextIteratorStreamer over HF generate — and the Gaudi static-shape
`GaudiGenerationMixin`, modeling_gaudi/generation/utils.py). Two modes:

- `generate_stream` / `generate`: a Python loop around ONE jitted decode step
  (prefill program + decode program, both static shapes — tokens yield as
  they decode, the streaming surface the chat layer consumes). All loop state
  (seen-token mask for repetition penalty) is fixed-shape so the step never
  retraces.
- `generate_compiled`: the whole decode loop inside `lax.scan`, one XLA
  program end-to-end. This is the benchmarking/throughput path: per-token
  Python dispatch (which dominates under remote-tunnel latency) disappears.

Sampling: greedy, temperature, top-k, top-p, repetition penalty — computed
in f32 on-device (reference GenerationConfig fields, neural_chat/config.py:400).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.registry import (
    get_apply_fn,
)
from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    init_kv_cache,
)


@dataclass(frozen=True)
class SamplingConfig:
    max_new_tokens: int = 128
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0  # 0 = disabled
    top_p: float = 1.0  # 1.0 = disabled
    repetition_penalty: float = 1.0
    eos_token_id: Optional[int] = None


def sample_logits(
    logits: jax.Array,  # (B, V)
    rng: jax.Array,
    cfg: SamplingConfig,
    seen_mask: Optional[jax.Array] = None,  # (B, V) bool — tokens already emitted
) -> jax.Array:
    """→ (B,) next token ids."""
    logits = logits.astype(jnp.float32)
    if cfg.repetition_penalty != 1.0 and seen_mask is not None:
        penalized = jnp.where(
            logits > 0, logits / cfg.repetition_penalty, logits * cfg.repetition_penalty
        )
        logits = jnp.where(seen_mask, penalized, logits)
    if not cfg.do_sample:
        return jnp.argmax(logits, axis=-1)

    if cfg.temperature != 1.0:
        logits = logits / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.top_k > 0:
        k = min(cfg.top_k, logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p; keep at least 1
        cutoff_idx = jnp.sum(cum < cfg.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def _seen_from_ids(ids: jax.Array, vocab: int) -> jax.Array:
    return jax.nn.one_hot(ids, vocab, dtype=jnp.bool_).any(axis=1)


def _mark_seen(seen: jax.Array, token: jax.Array) -> jax.Array:
    return seen | jax.nn.one_hot(token, seen.shape[-1], dtype=jnp.bool_)


@partial(jax.jit, static_argnames=("config", "cfg"))
def _decode_step(params, config, cfg, cache, token, rng, seen):
    logits, cache = get_apply_fn(config)(params, config, token[:, None], cache)
    rng, sub = jax.random.split(rng)
    nxt = sample_logits(logits[:, -1], sub, cfg, seen)
    seen = _mark_seen(seen, nxt)
    return nxt, cache, rng, seen


def generate_stream(
    params,
    config: LlamaConfig,
    input_ids,  # (B, T) or (T,)
    sampling: Optional[SamplingConfig] = None,
    *,
    max_cache_length: Optional[int] = None,
    cache_dtype=jnp.bfloat16,
    seed: int = 0,
    kv_policy=None,
) -> Iterator[np.ndarray]:
    """Yield (B,) token ids one decode step at a time."""
    cfg = sampling or SamplingConfig()
    ids = jnp.asarray(input_ids)
    if ids.ndim == 1:
        ids = ids[None, :]
    B, T = ids.shape
    S = max_cache_length or (T + cfg.max_new_tokens)
    if kv_policy is not None:
        cache = kv_policy.init_cache(config, B, S, dtype=cache_dtype)
        logits, cache = kv_policy.prefill(params, config, ids, cache)
    else:
        cache = init_kv_cache(config, B, S, dtype=cache_dtype)
        logits, cache = get_apply_fn(config)(params, config, ids, cache)

    rng = jax.random.PRNGKey(seed)
    rng, sub = jax.random.split(rng)
    seen = _seen_from_ids(ids, config.vocab_size)
    token = sample_logits(logits[:, -1], sub, cfg, seen)
    seen = _mark_seen(seen, token)

    eos = cfg.eos_token_id
    finished = np.zeros((B,), bool)
    for _ in range(cfg.max_new_tokens):
        out = np.asarray(token)
        yield out
        if eos is not None:
            finished |= out == eos
            if finished.all():
                return
        if kv_policy is not None:
            token, cache, rng, seen = kv_policy.decode_step(
                params, config, cfg, cache, token, rng, seen
            )
        else:
            token, cache, rng, seen = _decode_step(
                params, config, cfg, cache, token, rng, seen
            )


def generate(
    params,
    config: LlamaConfig,
    input_ids,
    sampling: Optional[SamplingConfig] = None,
    **kw,
) -> np.ndarray:
    """→ (B, ≤max_new_tokens) generated ids (prompt excluded)."""
    toks = list(generate_stream(params, config, input_ids, sampling, **kw))
    if not toks:
        return np.zeros((0, 0), np.int32)
    return np.stack(toks, axis=1)


@partial(jax.jit, static_argnames=("config", "cfg", "max_cache_length"))
def generate_compiled(
    params,
    config: LlamaConfig,
    input_ids: jax.Array,  # (B, T) — static shape
    cfg: SamplingConfig,
    rng: jax.Array,
    max_cache_length: int = 0,
):
    """Whole generation as one XLA program (lax.scan decode loop).

    → (tokens (B, max_new_tokens), lengths (B,)). Post-EOS positions hold EOS.
    """
    B, T = input_ids.shape
    S = max_cache_length or (T + cfg.max_new_tokens)
    cache = init_kv_cache(config, B, S, dtype=jnp.bfloat16)
    logits, cache = get_apply_fn(config)(params, config, input_ids, cache)
    rng, sub = jax.random.split(rng)
    seen = _seen_from_ids(input_ids, config.vocab_size)
    token0 = sample_logits(logits[:, -1], sub, cfg, seen)
    seen = _mark_seen(seen, token0)

    eos = cfg.eos_token_id if cfg.eos_token_id is not None else -1

    def step(carry, _):
        token, cache, rng, seen, done = carry
        logits, cache = get_apply_fn(config)(params, config, token[:, None], cache)
        rng, sub = jax.random.split(rng)
        nxt = sample_logits(logits[:, -1], sub, cfg, seen)
        seen = _mark_seen(seen, nxt)
        nxt = jnp.where(done, jnp.int32(eos), nxt)
        done = done | (nxt == eos)
        return (nxt, cache, rng, seen, done), nxt

    done0 = jnp.zeros((B,), bool) | (token0 == eos)
    (_, _, _, _, _), toks = jax.lax.scan(
        step, (token0, cache, rng, seen, done0), None, length=cfg.max_new_tokens - 1
    )
    toks = jnp.concatenate([token0[None, :], toks], axis=0).T  # (B, max_new)
    if cfg.eos_token_id is not None:
        not_eos = toks != eos
        lengths = jnp.sum(jnp.cumprod(not_eos.astype(jnp.int32), axis=1), axis=1)
    else:
        lengths = jnp.full((B,), cfg.max_new_tokens, jnp.int32)
    return toks, lengths


def detokenize_stream(
    token_iter: Iterator[np.ndarray], tokenizer, skip_special_tokens: bool = True
) -> Iterator[str]:
    """Incremental detokenizer: yields printable text deltas
    (role of HF TextIteratorStreamer in reference predict_stream)."""
    acc: list[int] = []
    printed = ""
    for tok in token_iter:
        acc.append(int(tok[0]) if tok.ndim else int(tok))
        text = tokenizer.decode(acc, skip_special_tokens=skip_special_tokens)
        # hold back trailing bytes of incomplete unicode/wordpieces
        if text.endswith("�"):
            continue
        if len(text) > len(printed):
            delta = text[len(printed) :]
            printed = text
            yield delta
