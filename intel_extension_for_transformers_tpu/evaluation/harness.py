"""LM evaluation harness core.

Re-creation of the reference's vendored lm-eval essentials
(reference: transformers/llm/evaluation/ — models/huggingface.py
`loglikelihood`, evaluator.py task loop). The two primitives everything in
lm-eval reduces to:

- `loglikelihood(context, continuation)` → (Σ log p(continuation|context),
  is_greedy) — powers multiple-choice accuracy tasks.
- `evaluate_perplexity(token_stream)` — rolling-window word/token ppl.

Evaluated as batched jitted forwards with static shapes: requests are padded
into (B, T) buckets with a continuation mask, so the whole choice set of a
question scores in one MXU pass.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("config",))
def _score_batch(params, config, ids, cont_mask):
    """ids (B, T) int32; cont_mask (B, T) 1 where the token is part of the
    continuation (scored). → (sum ll (B,), greedy_match (B,))."""
    from intel_extension_for_transformers_tpu.models.registry import get_apply_fn

    logits, _ = get_apply_fn(config)(params, config, ids)
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    tok_ll = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    m = cont_mask[:, 1:].astype(jnp.float32)
    ll = jnp.sum(tok_ll * m, axis=-1)
    greedy = jnp.all(
        jnp.where(m > 0, jnp.argmax(lp, axis=-1) == tgt, True), axis=-1
    )
    return ll, greedy


def _pad_batch(
    reqs: Sequence[Tuple[List[int], List[int]]], pad_id: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    T = max(len(c) + len(k) for c, k in reqs)
    T = max(T, 2)
    ids = np.full((len(reqs), T), pad_id, np.int32)
    mask = np.zeros((len(reqs), T), np.int32)
    for i, (ctx, cont) in enumerate(reqs):
        seq = list(ctx) + list(cont)
        ids[i, : len(seq)] = seq
        mask[i, len(ctx) : len(seq)] = 1
    return ids, mask


def loglikelihood(
    params,
    config,
    requests: Sequence[Tuple[List[int], List[int]]],
    batch_size: int = 8,
) -> List[Tuple[float, bool]]:
    """requests: [(context_ids, continuation_ids)] → [(ll, is_greedy)]
    (reference: lm-eval loglikelihood API)."""
    out: List[Tuple[float, bool]] = []
    for i in range(0, len(requests), batch_size):
        chunk = requests[i : i + batch_size]
        ids, mask = _pad_batch(chunk)
        ll, greedy = _score_batch(
            params, config, jnp.asarray(ids), jnp.asarray(mask)
        )
        out.extend(
            (float(a), bool(b)) for a, b in zip(np.asarray(ll), np.asarray(greedy))
        )
    return out


def evaluate_multiple_choice(
    params,
    config,
    questions: Iterable[dict],
    batch_size: int = 8,
    length_normalize: bool = True,
) -> dict:
    """questions: [{"context": [ids], "choices": [[ids], ...], "gold": int}]
    → {"accuracy": ..., "n": ...}. Choice = argmax (normalized) ll."""
    questions = list(questions)
    reqs, spans = [], []
    for q in questions:
        spans.append((len(reqs), len(q["choices"])))
        for ch in q["choices"]:
            reqs.append((q["context"], ch))
    scored = loglikelihood(params, config, reqs, batch_size)
    correct = 0
    for q, (start, n) in zip(questions, spans):
        lls = []
        for j in range(n):
            ll, _ = scored[start + j]
            denom = max(len(q["choices"][j]), 1) if length_normalize else 1
            lls.append(ll / denom)
        if int(np.argmax(lls)) == q["gold"]:
            correct += 1
    return {"accuracy": correct / max(len(questions), 1), "n": len(questions)}


def evaluate_perplexity(
    params,
    config,
    token_ids: Sequence[int],
    window: int = 512,
    stride: int = 512,
    batch_size: int = 8,
) -> dict:
    """Rolling-window perplexity over a token stream (reference:
    lm-eval rolling loglikelihood)."""
    ids = list(token_ids)
    reqs = []
    for s in range(0, max(len(ids) - 1, 1), stride):
        seg = ids[s : s + window]
        if len(seg) < 2:
            break
        reqs.append((seg[:1], seg[1:]))
    scored = loglikelihood(params, config, reqs, batch_size)
    total_ll = sum(ll for ll, _ in scored)
    total_tokens = sum(len(c) for _, c in reqs)
    nll = -total_ll / max(total_tokens, 1)
    return {
        "perplexity": float(np.exp(min(nll, 30.0))),
        "nll": float(nll),
        "tokens": total_tokens,
    }
