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
    # Windowed decode (the HF TextIteratorStreamer scheme): only the tokens
    # since the last emitted delta are ever re-decoded, so per-request cost
    # is O(n) in generated length instead of O(n^2) (ADVICE r2). Text that
    # has been yielded is never re-derived.
    acc: list[int] = []
    prefix_offset = 0  # start of the held-back decode window
    read_offset = 0    # end of the already-emitted portion of the window
    for tok in token_iter:
        acc.append(int(tok[0]) if tok.ndim else int(tok))
        prefix_text = tokenizer.decode(
            acc[prefix_offset:read_offset],
            skip_special_tokens=skip_special_tokens)
        text = tokenizer.decode(
            acc[prefix_offset:], skip_special_tokens=skip_special_tokens)
        # hold back trailing bytes of incomplete unicode/wordpieces
        if text.endswith("�"):
            continue
        if len(text) > len(prefix_text):
            delta = text[len(prefix_text):]
            prefix_offset = read_offset
            read_offset = len(acc)
            yield delta


# ------------------------------ beam search ------------------------------


@partial(
    jax.jit,
    static_argnames=("config", "num_beams", "max_new_tokens", "length_penalty"),
)
def _beam_search_loop(
    params, config, prompt, *, num_beams, max_new_tokens, length_penalty,
    eos_token_id,
):
    """Static-shape beam search (reference surface: HF generate(num_beams=N)
    passed through the reference's model_utils generation kwargs; algorithm
    re-derived in the alive/finished formulation that keeps every shape
    fixed for XLA).

    prompt (1, T) → (best_ids (max_new,), best_score, best_len).
    HF score convention: sum logprobs / len**length_penalty; early stopping
    when num_beams hypotheses finished.
    """
    apply_fn = get_apply_fn(config)
    NEG = jnp.float32(-1e9)
    K = num_beams
    T = prompt.shape[1]
    V = config.vocab_size
    S = T + max_new_tokens

    cache = init_kv_cache(config, K, S)
    ids_tiled = jnp.tile(prompt, (K, 1))
    logits, cache = apply_fn(params, config, ids_tiled, cache)

    alive_scores = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.full((K - 1,), NEG)]
    )
    alive_seqs = jnp.zeros((K, max_new_tokens), jnp.int32)
    alive_last = jnp.zeros((K,), jnp.int32)
    fin_seqs = jnp.zeros((K, max_new_tokens), jnp.int32)
    fin_scores = jnp.full((K,), NEG)
    fin_lens = jnp.zeros((K,), jnp.int32)

    eos = jnp.int32(-1 if eos_token_id is None else eos_token_id)

    def penal(length):
        return jnp.maximum(length, 1).astype(jnp.float32) ** jnp.float32(
            length_penalty
        )

    def step(carry, i):
        (last_logits, cache, alive_scores, alive_seqs, alive_last,
         fin_seqs, fin_scores, fin_lens) = carry
        logp = jax.nn.log_softmax(last_logits.astype(jnp.float32))  # (K, V)
        cand = alive_scores[:, None] + logp  # (K, V)
        # 2K candidates so that K survive even if K hit EOS this step
        top_scores, top_flat = jax.lax.top_k(cand.reshape(-1), 2 * K)
        parents = top_flat // V
        tokens = (top_flat % V).astype(jnp.int32)
        cand_seqs = jnp.take(alive_seqs, parents, axis=0).at[:, i].set(tokens)
        is_eos = tokens == eos

        # finished pool: existing K + eos'd candidates, keep best K
        cand_fin_scores = jnp.where(
            is_eos, top_scores / penal(i + 1), NEG
        )
        all_fin_scores = jnp.concatenate([fin_scores, cand_fin_scores])
        all_fin_seqs = jnp.concatenate([fin_seqs, cand_seqs])
        all_fin_lens = jnp.concatenate(
            [fin_lens, jnp.full((2 * K,), i + 1, jnp.int32)]
        )
        fin_top, fin_idx = jax.lax.top_k(all_fin_scores, K)
        fin_seqs2 = jnp.take(all_fin_seqs, fin_idx, axis=0)
        fin_lens2 = jnp.take(all_fin_lens, fin_idx)

        # alive pool: best K non-eos candidates
        alive_cand = jnp.where(is_eos, NEG, top_scores)
        a_top, a_idx = jax.lax.top_k(alive_cand, K)
        a_parents = jnp.take(parents, a_idx)
        alive_seqs2 = jnp.take(cand_seqs, a_idx, axis=0)
        alive_last2 = jnp.take(tokens, a_idx)

        # reorder the KV cache by parent beam
        cache2 = jax.tree.map(
            lambda x: jnp.take(x, a_parents, axis=0)
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == K
            else x,
            cache,
        )
        logits2, cache2 = apply_fn(
            params, config, alive_last2[:, None], cache2
        )
        return (
            (logits2[:, -1], cache2, a_top, alive_seqs2, alive_last2,
             fin_seqs2, fin_top, fin_lens2),
            None,
        )

    carry = (logits[:, -1], cache, alive_scores, alive_seqs, alive_last,
             fin_seqs, fin_scores, fin_lens)
    carry, _ = jax.lax.scan(
        step, carry, jnp.arange(max_new_tokens)
    )
    (_, _, alive_scores, alive_seqs, _, fin_seqs, fin_scores, fin_lens) = carry

    # finalize: best finished if any beat the (length-penalized) best alive
    alive_final = alive_scores / penal(max_new_tokens)
    best_alive = jnp.argmax(alive_final)
    have_fin = fin_scores[0] > NEG / 2
    use_fin = have_fin & (fin_scores[0] >= alive_final[best_alive])
    best_ids = jnp.where(use_fin, fin_seqs[0], alive_seqs[best_alive])
    best_score = jnp.where(use_fin, fin_scores[0], alive_final[best_alive])
    best_len = jnp.where(
        use_fin, fin_lens[0], jnp.int32(max_new_tokens)
    )
    return best_ids, best_score, best_len


def generate_beam(
    params,
    config: LlamaConfig,
    input_ids,  # (T,) or (1, T)
    *,
    num_beams: int = 4,
    max_new_tokens: int = 32,
    length_penalty: float = 1.0,
    eos_token_id: Optional[int] = None,
) -> tuple[np.ndarray, float]:
    """Beam-search decode → (generated ids INCLUDING the final eos if hit,
    sequence score). One fully-compiled lax.scan program; all shapes static
    in (num_beams, max_new_tokens)."""
    ids = jnp.asarray(input_ids, jnp.int32)
    if ids.ndim == 1:
        ids = ids[None, :]
    best_ids, best_score, best_len = _beam_search_loop(
        params, config, ids,
        num_beams=num_beams, max_new_tokens=max_new_tokens,
        length_penalty=float(length_penalty), eos_token_id=eos_token_id,
    )
    n = int(best_len)
    return np.asarray(best_ids)[:n], float(best_score)
