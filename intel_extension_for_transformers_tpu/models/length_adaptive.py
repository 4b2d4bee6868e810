"""Length-adaptive transformer inference (QuaLA-MiniLM style).

Re-derivation of the reference's "dynamic" subsystem
(reference: transformers/dynamic/drop_and_restore_utils.py:30
`sample_length_configuration`, dynamic/evolution.py:22-60 evolutionary
search, modeling_bert_dynamic.py token drop-and-restore,
`DynamicLengthConfig` transformers/config.py:82).

TPU formulation: dropping tokens with data-dependent shapes would defeat XLA,
so a *length configuration* is a static per-layer token budget — each layer
ends with a `lax.top_k` significance selection down to a fixed L_i and a
gather. One compiled program per configuration (configurations are few and
bucketed, exactly like the reference's Gaudi static-shape bucketing).
Significance = attention mass received per token (summed over heads+queries),
the same oracle the reference uses. Drop-and-restore: dropped tokens' hidden
states are scattered back into a full-size output buffer at the layer where
they were dropped, so token-level tasks still get (B, T, H) outputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.bert import BertConfig
from intel_extension_for_transformers_tpu.ops.layers import (
    dense,
    gelu,
    layer_norm,
)


@dataclass
class DynamicLengthConfig:
    """(reference: transformers/config.py:82)"""

    length_config: Optional[Tuple[int, ...]] = None  # per-layer token budgets
    const_rate: Optional[float] = None  # alt: uniform keep-rate per layer
    max_length: int = 512

    def resolve(self, num_layers: int, seq_len: int) -> Tuple[int, ...]:
        if self.length_config is not None:
            return tuple(self.length_config)
        rate = self.const_rate or 1.0
        lens, cur = [], seq_len
        for _ in range(num_layers):
            cur = max(1, int(round(cur * rate)))
            lens.append(cur)
        return tuple(lens)


def _attention_with_probs(q, k, v, mask):
    """Like ops.layers.attention but also returns per-token received mass."""
    B, T, nh, hd = q.shape
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / hd**0.5)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)
    # significance: total attention mass flowing INTO each key token
    sig = jnp.sum(probs, axis=(1, 2))  # (B, Tk)
    return ctx, sig


@partial(jax.jit, static_argnames=("config", "length_config"))
def bert_apply_length_adaptive(
    params: dict,
    config: BertConfig,
    input_ids: jax.Array,  # (B, T)
    attention_mask: Optional[jax.Array] = None,
    length_config: Tuple[int, ...] = (),
):
    """→ (restored (B, T, H), final_kept_hidden (B, L_last, H),
          kept_positions (B, L_last)).

    `restored` has every original position filled with that token's hidden
    state from the layer it was dropped at (drop-and-restore)."""
    B, T = input_ids.shape
    h = config.hidden_size
    nh = config.num_attention_heads
    hd = h // nh
    assert len(length_config) == config.num_hidden_layers

    emb = params["embeddings"]
    positions = jnp.arange(T)[None, :]
    x = (
        jnp.take(emb["word_embeddings"], input_ids, axis=0)
        + jnp.take(emb["position_embeddings"], positions, axis=0)
        + emb["token_type_embeddings"][0][None, None, :]
    )
    x = layer_norm(x, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps)

    valid = (
        attention_mask.astype(bool)
        if attention_mask is not None
        else jnp.ones((B, T), bool)
    )
    orig_idx = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))  # original pos
    restored = x  # (B, T, H) buffer: every position's last-seen hidden

    for li, layer in enumerate(params["layers"]):
        Tl = x.shape[1]
        att = layer["attention"]
        mask4 = valid[:, None, None, :]  # (B,1,1,Tk)
        q = dense(x, att["query"]["kernel"], att["query"]["bias"]).reshape(
            B, Tl, nh, hd
        )
        k = dense(x, att["key"]["kernel"], att["key"]["bias"]).reshape(B, Tl, nh, hd)
        v = dense(x, att["value"]["kernel"], att["value"]["bias"]).reshape(
            B, Tl, nh, hd
        )
        ctx, sig = _attention_with_probs(q, k, v, mask4)
        ctx = dense(ctx.reshape(B, Tl, h), att["output"]["kernel"],
                    att["output"]["bias"])
        x = layer_norm(x + ctx, att["ln_scale"], att["ln_bias"],
                       config.layer_norm_eps)
        mlp = layer["mlp"]
        y = dense(x, mlp["intermediate"]["kernel"], mlp["intermediate"]["bias"])
        y = gelu(y, approximate=False)
        y = dense(y, mlp["output"]["kernel"], mlp["output"]["bias"])
        x = layer_norm(x + y, mlp["ln_scale"], mlp["ln_bias"],
                       config.layer_norm_eps)

        # stash current hiddens at original positions (drop-and-restore)
        restored = jax.vmap(lambda r, xi, oi: r.at[oi].set(xi))(restored, x, orig_idx)

        L = min(length_config[li], Tl)
        if L < Tl:
            score = jnp.where(valid, sig, -jnp.inf)
            score = score.at[:, 0].set(jnp.inf)  # CLS always survives
            _, keep = jax.lax.top_k(score, L)  # (B, L)
            keep = jnp.sort(keep, axis=1)  # preserve token order
            x = jnp.take_along_axis(x, keep[:, :, None], axis=1)
            valid = jnp.take_along_axis(valid, keep, axis=1)
            orig_idx = jnp.take_along_axis(orig_idx, keep, axis=1)

    restored = jax.vmap(lambda r, xi, oi: r.at[oi].set(xi))(restored, x, orig_idx)
    return restored, x, orig_idx


# --------------------------------------------------------------- evolution


@dataclass
class LengthConfigCandidate:
    lengths: Tuple[int, ...]
    score: float = 0.0  # task quality (higher better)
    cost: float = 1.0  # relative compute (Σ L_i / (layers·T))


def compute_cost(lengths: Sequence[int], seq_len: int) -> float:
    return float(sum(lengths)) / (len(lengths) * seq_len)


def evolutionary_search(
    eval_fn: Callable[[Tuple[int, ...]], float],
    num_layers: int,
    seq_len: int,
    population_size: int = 12,
    generations: int = 6,
    mutation_prob: float = 0.5,
    seed: int = 0,
) -> List[LengthConfigCandidate]:
    """Search per-layer length configs (reference: dynamic/evolution.py:22 —
    mutate/crossover, keep the accuracy-vs-cost pareto frontier).

    eval_fn(lengths) → quality in [0, 1]. Returns the pareto front sorted by
    cost ascending."""
    rng = np.random.default_rng(seed)

    def sanitize(lens) -> Tuple[int, ...]:
        out, cur = [], seq_len
        for l in lens:
            cur = int(np.clip(l, 1, cur))  # monotone non-increasing
            out.append(cur)
        return tuple(out)

    def mutate(lens) -> Tuple[int, ...]:
        out = list(lens)
        for i in range(len(out)):
            if rng.random() < mutation_prob:
                out[i] = int(out[i] * rng.uniform(0.6, 1.2))
        return sanitize(out)

    def crossover(a, b) -> Tuple[int, ...]:
        cut = rng.integers(1, num_layers) if num_layers > 1 else 0
        return sanitize(list(a[:cut]) + list(b[cut:]))

    # seed population: uniform keep-rates
    population = [
        sanitize([max(1, int(seq_len * r**(i + 1))) for i in range(num_layers)])
        for r in np.linspace(0.7, 1.0, population_size)
    ]
    seen: dict = {}

    def evaluate(lens) -> LengthConfigCandidate:
        if lens not in seen:
            seen[lens] = LengthConfigCandidate(
                lens, float(eval_fn(lens)), compute_cost(lens, seq_len)
            )
        return seen[lens]

    cands = [evaluate(l) for l in dict.fromkeys(population)]
    for _ in range(generations):
        front = pareto_front(cands)
        parents = front if len(front) >= 2 else cands
        children = []
        for _ in range(population_size):
            a = parents[rng.integers(len(parents))].lengths
            b = parents[rng.integers(len(parents))].lengths
            children.append(mutate(crossover(a, b)))
        cands.extend(evaluate(c) for c in dict.fromkeys(children))
    return sorted(pareto_front(cands), key=lambda c: c.cost)


def pareto_front(cands: List[LengthConfigCandidate]) -> List[LengthConfigCandidate]:
    front = []
    for c in cands:
        dominated = any(
            (o.score >= c.score and o.cost < c.cost)
            or (o.score > c.score and o.cost <= c.cost)
            for o in cands
        )
        if not dominated:
            front.append(c)
    # dedup by lengths
    uniq = {c.lengths: c for c in front}
    return list(uniq.values())
