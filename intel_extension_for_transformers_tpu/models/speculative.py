"""Speculative decoding: draft-model proposal + target-model verification.

Re-creation of the reference's assisted generation
(reference: neural_chat/models/model_utils.py:503-516 — HF
`assistant_model=` speculative decoding; examples/.../text-generation/
assisted_generation). TPU-native design:

- Static shapes throughout: the draft decodes a fixed K tokens per round
  (lax.scan), the target verifies all K+1 positions in ONE forward — the
  MXU sees a (K+1)-token matmul instead of K+1 serial decode dispatches.
- Acceptance (Leviathan/Chen speculative sampling: accept d_i w.p.
  min(1, p_i/q_i), resample the first reject from max(p-q, 0)) runs fully
  ON DEVICE; the host reads back only (n_accepted, next_token).
- Cache rewind is free: the slot KV cache masks attention on absolute
  positions, so rejecting tokens = resetting `cache.length` — stale slots
  beyond the new length are never attended (models/llama.py mask).
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.generation import SamplingConfig
from intel_extension_for_transformers_tpu.models.registry import (
    get_apply_fn,
)
from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    init_kv_cache,
)


def _probs(logits: jax.Array, temperature: float) -> jax.Array:
    t = max(temperature, 1e-4)
    return jax.nn.softmax(logits.astype(jnp.float32) / t, axis=-1)


@partial(
    jax.jit, static_argnames=("config", "spec_k", "temperature", "greedy")
)
def _draft_propose(params, config, cache, cur, rng, spec_k, temperature, greedy):
    """From token `cur` (1,) decode spec_k draft tokens.
    → (tokens (K,), q probs (K, V), cache advanced K+1 — includes the last
    draft token so both caches stay position-aligned)."""

    def step(carry, _):
        tok, cache, rng = carry
        logits, cache = get_apply_fn(config)(params, config, tok[None, :], cache)
        q = _probs(logits[0, -1], temperature)
        rng, sub = jax.random.split(rng)
        if greedy:
            nxt = jnp.argmax(q)[None].astype(jnp.int32)
        else:
            nxt = jax.random.categorical(sub, jnp.log(q + 1e-20))[None].astype(
                jnp.int32
            )
        return (nxt, cache, rng), (nxt[0], q)

    (last, cache, rng), (toks, qs) = jax.lax.scan(
        step, (cur, cache, rng), None, length=spec_k
    )
    # append the final draft token to the draft cache (logits unused) so the
    # cache holds cur..d_K and a full-accept round needs no catch-up pass
    _, cache = get_apply_fn(config)(params, config, last[None, :], cache)
    return toks, qs, cache, rng


@partial(
    jax.jit, static_argnames=("config", "spec_k", "temperature", "greedy")
)
def _verify(params, config, cache, cur, drafts, qs, rng, spec_k, temperature,
            greedy):
    """Target forward over [cur, d_1..d_K]; on-device acceptance.
    → (n_accept scalar, next_token scalar, cache advanced K+1, rng)."""
    seq = jnp.concatenate([cur, drafts])[None, :]  # (1, K+1)
    logits, cache = get_apply_fn(config)(params, config, seq, cache)
    p = _probs(logits[0], temperature)  # (K+1, V): p[i] is dist of token i+1

    if greedy:
        accept = drafts == jnp.argmax(p[:spec_k], axis=-1)
    else:
        rng, sub = jax.random.split(rng)
        u = jax.random.uniform(sub, (spec_k,))
        p_d = jnp.take_along_axis(p[:spec_k], drafts[:, None], axis=1)[:, 0]
        q_d = jnp.take_along_axis(qs, drafts[:, None], axis=1)[:, 0]
        accept = u < jnp.minimum(1.0, p_d / jnp.maximum(q_d, 1e-20))

    run = jnp.cumprod(accept.astype(jnp.int32))
    n = jnp.sum(run)  # leading accepts, 0..K

    if greedy:
        # deterministic: the next token is the target argmax at the first
        # reject (or the bonus position when everything was accepted)
        nxt = jnp.argmax(p[n]).astype(jnp.int32)
    else:
        # residual max(p_n - q_n, 0) at the first reject, or bonus p[K]
        i = jnp.minimum(n, spec_k - 1)
        resid = jnp.maximum(p[i] - qs[i], 0.0)
        resid = resid / jnp.maximum(jnp.sum(resid), 1e-20)
        dist = jnp.where(n == spec_k, p[spec_k], resid)
        rng, sub = jax.random.split(rng)
        nxt = jax.random.categorical(sub, jnp.log(dist + 1e-20)).astype(jnp.int32)
    return n, nxt, cache, rng


def generate_speculative_stream(
    target_params,
    target_config: LlamaConfig,
    draft_params,
    draft_config: LlamaConfig,
    input_ids,
    sampling: Optional[SamplingConfig] = None,
    *,
    spec_k: int = 4,
    max_cache_length: Optional[int] = None,
    cache_dtype=jnp.bfloat16,
    seed: int = 0,
    stats: Optional[dict] = None,
) -> Iterator[np.ndarray]:
    """Yield accepted tokens chunk-by-chunk; mathematically distributed as
    target-only sampling (exact match for greedy). Batch size 1.

    `stats` (optional dict) is filled with acceptance counters."""
    cfg = sampling or SamplingConfig()
    ids = jnp.asarray(input_ids)
    if ids.ndim == 1:
        ids = ids[None, :]
    assert ids.shape[0] == 1, "speculative decoding is a single-stream path"
    T = ids.shape[1]
    S = max_cache_length or (T + cfg.max_new_tokens + spec_k + 2)
    greedy = (not cfg.do_sample) or cfg.temperature <= 0
    temp = cfg.temperature if cfg.do_sample else 0.0

    t_cache = init_kv_cache(target_config, 1, S, dtype=cache_dtype)
    d_cache = init_kv_cache(draft_config, 1, S, dtype=cache_dtype)
    t_logits, t_cache = get_apply_fn(target_config)(
        target_params, target_config, ids, t_cache
    )
    _, d_cache = get_apply_fn(draft_config)(draft_params, draft_config, ids, d_cache)

    rng = jax.random.PRNGKey(seed)
    p0 = _probs(t_logits[0, -1], temp)
    if greedy:
        cur = jnp.argmax(p0)[None].astype(jnp.int32)
    else:
        rng, sub = jax.random.split(rng)
        cur = jax.random.categorical(sub, jnp.log(p0 + 1e-20))[None].astype(
            jnp.int32
        )

    # caches hold the prompt; cur is the first generated token (not cached yet)
    produced = 0
    accepted_total, rounds = 0, 0
    eos = cfg.eos_token_id
    out_chunk = [int(cur[0])]
    produced += 1
    if eos is not None and int(cur[0]) == eos:
        yield np.asarray(out_chunk, np.int32)
        return

    while produced < cfg.max_new_tokens:
        base = t_cache.length  # context length before this round
        drafts, qs, d_cache, rng = _draft_propose(
            draft_params, draft_config, d_cache, cur, rng, spec_k, temp, greedy
        )
        n, nxt, t_cache, rng = _verify(
            target_params, target_config, t_cache, cur, drafts, qs, rng,
            spec_k, temp, greedy,
        )
        n_i = int(n)
        rounds += 1
        accepted_total += n_i
        # rewind both caches to base + 1 (cur) + n accepted drafts
        new_len = base + 1 + n_i
        t_cache = replace(t_cache, length=jnp.int32(new_len))
        d_cache = replace(d_cache, length=jnp.int32(new_len))

        toks = [int(t) for t in np.asarray(drafts[:n_i])] + [int(nxt)]
        for t in toks:
            if produced >= cfg.max_new_tokens:
                break
            out_chunk.append(t)
            produced += 1
            if eos is not None and t == eos:
                if stats is not None:
                    stats.update(
                        rounds=rounds,
                        accepted=accepted_total,
                        acceptance_rate=accepted_total / max(1, rounds * spec_k),
                    )
                yield np.asarray(out_chunk, np.int32)
                return
        cur = jnp.asarray([toks[-1]], jnp.int32)
        yield np.asarray(out_chunk, np.int32)
        out_chunk = []

    if out_chunk:
        yield np.asarray(out_chunk, np.int32)
    if stats is not None:
        stats.update(
            rounds=rounds,
            accepted=accepted_total,
            acceptance_rate=accepted_total / max(1, rounds * spec_k),
        )


def generate_speculative(
    target_params,
    target_config: LlamaConfig,
    draft_params,
    draft_config: LlamaConfig,
    input_ids,
    sampling: Optional[SamplingConfig] = None,
    **kw,
) -> np.ndarray:
    """→ (1, ≤max_new_tokens) generated ids."""
    chunks = list(
        generate_speculative_stream(
            target_params,
            target_config,
            draft_params,
            draft_config,
            input_ids,
            sampling,
            **kw,
        )
    )
    if not chunks:
        return np.zeros((1, 0), np.int32)
    return np.concatenate(chunks)[None, :]
