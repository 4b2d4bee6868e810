"""Continuous-batching decode engine: slot-based join/leave generation.

The reference answers serving concurrency by adopting vLLM
(reference: transformers/modeling/modeling_auto.py:364-533) — this stack owns
its engine, so it implements the core idea natively on the XLA execution
model:

- A fixed pool of B decode *slots* shares ONE jitted decode step — a
  `vmap` over per-slot KV caches of the same per-family apply fn the rest of
  the stack uses (`models/registry.get_apply_fn`), so every decoder family
  (llama/mistral/qwen2/gptj/mpt/falcon/...) gets continuous batching for
  free. Per-slot cache lengths (a mapped `KVCache.length`) give every slot
  its own position stream — the static-shape analogue of vLLM's paged
  attention bookkeeping.
- Requests JOIN by prefilling into a single-slot cache (prompt padded to a
  length bucket — the Gaudi-port bucketing idea, modeling_gaudi
  generation/utils.py:88-110 — so the prefill program set stays small) and
  scattering it into the batched cache at a free slot. Right-padding is
  correct without masks: pad keys sit at positions > the true last token,
  and the causal position mask already excludes them.
- Slots LEAVE on EOS / max_new_tokens; the freed slot is re-assigned to the
  next queued request. Inactive slots still step (masked, static shapes) —
  the XLA-friendly trade: no recompiles, ~zero marginal cost at small B.
- Per-slot sampling: temperature / top-k / top-p / repetition-penalty are
  ARRAYS, so one compiled step serves heterogeneous requests.

The host loop runs in one background thread; callers get a thread-safe
iterator of tokens. Aggregate throughput ≈ the batch-B decode number (the
1.62 ms/token batch-8 measurement in BENCHMARKS.md) instead of B × the
single-stream latency the round-1 lock gave.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field, replace
from functools import partial
from typing import Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.registry import get_apply_fn
from intel_extension_for_transformers_tpu.models.llama import init_kv_cache


# --------------------------- batched sampling ---------------------------


def sample_logits_per_slot(
    logits: jax.Array,  # (B, V) f32
    rng: jax.Array,
    temperature: jax.Array,  # (B,)
    top_k: jax.Array,  # (B,) int32, 0 = off
    top_p: jax.Array,  # (B,) in (0, 1], 1 = off
    do_sample: jax.Array,  # (B,) bool
    rep_penalty: jax.Array,  # (B,), 1 = off
    seen: jax.Array,  # (B, V) bool
    allow: jax.Array = None,  # (B, V) bool — guided decoding mask
) -> jax.Array:
    """Vectorized per-slot sampler (each row has its own knobs)."""
    logits = logits.astype(jnp.float32)
    if allow is not None:
        logits = jnp.where(allow, logits, -jnp.inf)
    rp = rep_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(seen & (rp != 1.0), penalized, logits)

    greedy = jnp.argmax(logits, axis=-1)

    scaled = logits / jnp.maximum(temperature[:, None], 1e-6)
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]  # (B, V)
    V = logits.shape[-1]
    # top-k: threshold at the k-th largest (k=0 → no threshold)
    k_idx = jnp.clip(top_k - 1, 0, V - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)
    thresh_k = jnp.where(top_k[:, None] > 0, kth, -jnp.inf)
    # top-p: smallest prefix of sorted probs with cumsum ≥ p (≥1 kept)
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p[:, None], axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_desc, jnp.minimum(cutoff_idx, V - 1), axis=-1)
    thresh_p = jnp.where(top_p[:, None] < 1.0, cutoff, -jnp.inf)

    filtered = jnp.where(
        scaled < jnp.maximum(thresh_k, thresh_p), -jnp.inf, scaled
    )
    sampled = jax.random.categorical(rng, filtered, axis=-1)
    return jnp.where(do_sample, sampled, greedy).astype(jnp.int32)


# ----------------------------- jitted steps -----------------------------


@partial(jax.jit, static_argnames=("config",))
def _engine_step(
    params, config, cache, tokens, rng,
    temperature, top_k, top_p, do_sample, rep_penalty, seen, allow,
):
    """One decode step for all slots: vmapped apply + per-slot sampling."""
    apply_fn = get_apply_fn(config)

    def one(cache_slot, tok):
        logits, new_cache = apply_fn(params, config, tok[None, None], cache_slot)
        return logits[0, -1], new_cache

    logits, cache = jax.vmap(one)(cache, tokens)  # (B, V)
    rng, sub = jax.random.split(rng)
    nxt = sample_logits_per_slot(
        logits, sub, temperature, top_k, top_p, do_sample, rep_penalty, seen,
        allow,
    )
    seen = seen | jax.nn.one_hot(nxt, seen.shape[-1], dtype=jnp.bool_)
    return nxt, cache, rng, seen


@partial(jax.jit, static_argnames=("config", "draft_config", "gamma"))
def _spec_engine_step(
    params, config, draft_params, draft_config, cache, draft_cache,
    tokens, rng,
    temperature, top_k, top_p, do_sample, rep_penalty, seen, allow,
    gamma: int,
):
    """One SPECULATIVE decode step for all slots (draft-and-verify).

    Reference analogue: assistant-model speculative decoding
    (transformers/modeling/modeling_auto.py generation kwargs) — here fused
    into the continuous-batching pool: the draft proposes `gamma` tokens per
    slot (greedy, one lax.scan), the target verifies all of them in ONE
    batched (gamma+1)-token forward, and each slot advances by its own
    accepted length n+1 ∈ [1, gamma+1]. Greedy slots are bit-exact vs plain
    decoding (accept while draft == target argmax); sampled or
    repetition-penalized slots force n=0 and take the target's l0 sample —
    also bit-exact vs `_engine_step`.

    Returns (out_tokens (B, gamma+1), out_count (B,), next tokens, caches,
    rng, seen). Dirty KV entries past each slot's accepted length are
    overwritten by later writes and masked meanwhile (position mask).
    """
    apply_fn = get_apply_fn(config)
    draft_apply = get_apply_fn(draft_config)
    B = tokens.shape[0]

    # 1. draft: gamma+1 greedy steps — proposes d1..dgamma and PROCESSES
    # t0..dgamma so its cache stays one-feed-per-token aligned with the
    # target's accepted history (the last proposal is discarded)
    def draft_one(carry, _):
        dcache, tok = carry

        def one(cs, t):
            logits, nc = draft_apply(draft_params, draft_config, t[None, None], cs)
            return logits[0, -1], nc

        logits, dcache = jax.vmap(one)(dcache, tok)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (dcache, nxt), nxt

    (draft_cache, _), proposals = jax.lax.scan(
        draft_one, (draft_cache, tokens), None, length=gamma + 1
    )
    drafts = proposals[:gamma].T  # (B, gamma) = d1..dgamma

    # 2. target verifies [t0, d1..dgamma] in one (gamma+1)-token forward
    seq = jnp.concatenate([tokens[:, None], drafts], axis=1)  # (B, gamma+1)

    def onev(cs, s):
        logits, nc = apply_fn(params, config, s[None], cs)
        return logits[0].astype(jnp.float32), nc

    logits, cache = jax.vmap(onev)(cache, seq)  # (B, gamma+1, V)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # g0..ggamma

    # n = longest accepted prefix (d_{i+1} == g_i); sampling/penalty → n=0
    ok = (drafts == greedy[:, :gamma]).astype(jnp.int32)
    n = jnp.sum(jnp.cumprod(ok, axis=1), axis=1)  # (B,)
    guided = ~jnp.all(allow, axis=-1)  # constrained slots step one-by-one
    spec_ok = (~do_sample) & (rep_penalty == 1.0) & (~guided)
    n = jnp.where(spec_ok, n, 0)

    # correction/extension token: g_n for greedy slots, per-slot sample of
    # l0 for the forced-n=0 slots
    rng, sub = jax.random.split(rng)
    sampled0 = sample_logits_per_slot(
        logits[:, 0], sub, temperature, top_k, top_p, do_sample, rep_penalty,
        seen, allow,
    )
    gn = jnp.take_along_axis(greedy, n[:, None], axis=1)[:, 0]
    nxt = jnp.where(spec_ok, gn, sampled0)

    # emitted tokens this step: d1..dn then nxt (count n+1)
    pos = jnp.arange(gamma + 1)[None, :]
    out_tokens = jnp.concatenate([drafts, jnp.zeros((B, 1), jnp.int32)], axis=1)
    out_tokens = jnp.where(pos == n[:, None], nxt[:, None], out_tokens)
    out_count = n + 1

    # roll cache lengths back to the accepted history (both advanced gamma+1)
    cache = replace(cache, length=cache.length - gamma + n)
    draft_cache = replace(draft_cache, length=draft_cache.length - gamma + n)

    emitted_hot = jax.nn.one_hot(out_tokens, seen.shape[-1], dtype=jnp.bool_)
    seen = seen | jnp.any(emitted_hot & (pos <= n[:, None])[..., None], axis=1)
    return out_tokens, out_count, nxt, cache, draft_cache, rng, seen


@partial(jax.jit, static_argnames=("config", "max_len", "kv_dtype"))
def _engine_prefill(params, config, ids, true_len, max_len: int,
                    kv_dtype="bfloat16"):
    """Prefill ONE request into a fresh single-slot cache.

    ids: (1, T_bucket) right-padded. Right-pad needs no attention mask: real
    token at position q attends keys ≤ q, and pads sit at positions > q.
    → (last_real_logits (V,), slot cache with length = true_len, seen (V,)).
    """
    apply_fn = get_apply_fn(config)
    cache = init_kv_cache(config, 1, max_len, dtype=kv_dtype)
    logits, cache = apply_fn(params, config, ids, cache)
    last = logits[0, true_len - 1].astype(jnp.float32)
    cache = replace(cache, length=true_len.astype(cache.length.dtype))
    pos = jnp.arange(ids.shape[1])
    seen = (
        jax.nn.one_hot(ids[0], logits.shape[-1], dtype=jnp.bool_)
        & (pos < true_len)[:, None]
    ).any(axis=0)
    return last, cache, seen


@jax.jit
def _insert_slot(batch_cache, slot_cache, slot, seen_all, seen_row):
    """Scatter a prefilled single-slot cache into the batched cache
    (covers k/v and, for int8 KV caches, the scale planes)."""

    def ins(b, s):
        return jax.lax.dynamic_update_slice(
            b, s[None].astype(b.dtype), (slot,) + (jnp.int32(0),) * (b.ndim - 1)
        )

    fields = {}
    for name in ("k", "v", "k_scale", "v_scale"):
        bl, sl = getattr(batch_cache, name), getattr(slot_cache, name)
        fields[name] = (
            [ins(b, s) for b, s in zip(bl, sl)] if bl is not None else None
        )
    length = jax.lax.dynamic_update_slice(
        batch_cache.length, slot_cache.length[None], (slot,)
    )
    seen_all = jax.lax.dynamic_update_slice(
        seen_all, seen_row[None], (slot, jnp.int32(0))
    )
    return replace(batch_cache, length=length, **fields), seen_all


@jax.jit
def _first_token(last_logits, rng, cfg_arrays, seen_row, allow_row):
    temperature, top_k, top_p, do_sample, rep = cfg_arrays
    tok = sample_logits_per_slot(
        last_logits[None],
        rng,
        temperature[None],
        top_k[None],
        top_p[None],
        do_sample[None],
        rep[None],
        seen_row[None],
        allow_row[None],
    )[0]
    return tok, seen_row | jax.nn.one_hot(tok, seen_row.shape[0], dtype=jnp.bool_)


# ------------------------------ the engine ------------------------------


@dataclass
class EngineRequest:
    prompt_ids: np.ndarray  # (T,) int32
    max_new_tokens: int = 128
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    do_sample: bool = False
    repetition_penalty: float = 1.0
    eos_token_id: Optional[int] = None
    # guided choice (vLLM-style constrained decoding): token sequences, one
    # per allowed output string — every emitted token must extend one of
    # them; the slot finishes when a full sequence has been emitted
    guided_token_seqs: Optional[list] = None
    out: "queue.Queue" = field(default_factory=queue.Queue)
    cancelled: bool = field(default=False)

    _DONE = object()

    def cancel(self) -> None:
        """Abandon the request: its slot frees at the next decode step
        (client-disconnect handling — a dropped SSE stream must not keep
        burning a slot)."""
        self.cancelled = True

    def tokens(self) -> Iterator[int]:
        """Blocking iterator over generated token ids; stops early when the
        request is cancelled."""
        while True:
            item = self.out.get()
            if item is EngineRequest._DONE:
                return
            yield item


class DecodeEngine:
    """Slot-based continuous-batching generation engine (module docstring)."""

    def __init__(
        self,
        params,
        config,
        *,
        max_slots: int = 8,
        max_len: int = 1024,
        prompt_buckets: tuple[int, ...] = (32, 64, 128, 256, 512),
        seed: int = 0,
        draft_params=None,
        draft_config=None,
        num_speculative_tokens: int = 4,
        kv_dtype="bfloat16",  # "int8": half the KV HBM → ~2× slots/context
    ):
        self.params = params
        self.config = config
        self.max_slots = max_slots
        self.max_len = max_len
        self.prompt_buckets = tuple(sorted(prompt_buckets))
        self.draft_params = draft_params
        self.draft_config = draft_config
        self.gamma = int(num_speculative_tokens)
        if (draft_params is None) != (draft_config is None):
            raise ValueError("draft_params and draft_config go together")
        V = config.vocab_size

        self.kv_dtype = kv_dtype

        def batched_cache(cfg):
            base = init_kv_cache(cfg, 1, max_len, dtype=kv_dtype)
            return jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (max_slots,) + x.shape).copy()
                if hasattr(x, "shape") and x.ndim
                else jnp.zeros((max_slots,), jnp.int32),
                base,
            )

        self._cache = batched_cache(config)
        self._draft_cache = (
            batched_cache(draft_config) if draft_config is not None else None
        )
        self._tokens = jnp.zeros((max_slots,), jnp.int32)
        self._seen = jnp.zeros((max_slots, V), jnp.bool_)
        self._allow = jnp.ones((max_slots, V), jnp.bool_)
        self._guides: list = [None] * max_slots
        self._rng = jax.random.PRNGKey(seed)
        # per-slot sampling knobs (host mirrors; device arrays rebuilt on join)
        self._temp = np.ones((max_slots,), np.float32)
        self._topk = np.zeros((max_slots,), np.int32)
        self._topp = np.ones((max_slots,), np.float32)
        self._dos = np.zeros((max_slots,), bool)
        self._rep = np.ones((max_slots,), np.float32)

        self._slots: list[Optional[EngineRequest]] = [None] * max_slots
        self._emitted = np.zeros((max_slots,), np.int64)
        self._total_tokens = 0  # emitted tokens since start
        self._total_requests = 0  # completed requests
        self._pending: "queue.Queue[EngineRequest]" = queue.Queue()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._steps = 0  # decode steps executed (for tests/metrics)

    # ------------------------------ public ------------------------------

    def start(self) -> "DecodeEngine":
        if self._thread is None or not self._thread.is_alive():
            self._stop.clear()
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=30)

    def submit(self, request: EngineRequest) -> EngineRequest:
        """Enqueue a request; its `tokens()` iterator starts yielding as soon
        as a slot frees up. Thread-safe."""
        request.prompt_ids = np.asarray(request.prompt_ids, np.int32).reshape(-1)
        if len(request.prompt_ids) >= self.max_len:
            raise ValueError(
                f"prompt length {len(request.prompt_ids)} ≥ max_len {self.max_len}"
            )
        self._pending.put(request)
        self._wake.set()
        return request

    @property
    def active_slots(self) -> int:
        return sum(s is not None for s in self._slots)

    def stats(self) -> dict:
        """Serving counters for the /v1/stats endpoint."""
        return {
            "active_slots": self.active_slots,
            "max_slots": self.max_slots,
            "queued": self._pending.qsize(),
            "decode_steps": self._steps,
            "total_tokens": self._total_tokens,
            "completed_requests": self._total_requests,
            "speculative": self._draft_cache is not None,
            "kv_dtype": str(self.kv_dtype),
        }

    # ------------------------------ internals ------------------------------

    def _bucket(self, t: int) -> int:
        for b in self.prompt_buckets:
            if t <= b and b < self.max_len:
                return b
        b = max(self.prompt_buckets)
        while b < t:  # prompts beyond the bucket menu: double, never truncate
            b *= 2
        return min(b, self.max_len - 1)

    def _admit(self, req: EngineRequest, slot: int) -> None:
        ids = np.asarray(req.prompt_ids, np.int32).reshape(-1)
        t = len(ids)
        bucket = self._bucket(t)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, : min(t, bucket)] = ids[:bucket]
        true_len = jnp.int32(min(t, bucket))
        last, slot_cache, seen_row = _engine_prefill(
            self.params, self.config, jnp.asarray(padded), true_len,
            self.max_len, self.kv_dtype,
        )
        self._temp[slot] = req.temperature
        self._topk[slot] = req.top_k
        self._topp[slot] = req.top_p
        self._dos[slot] = req.do_sample
        self._rep[slot] = req.repetition_penalty
        self._rng, sub = jax.random.split(self._rng)
        cfg_arrays = (
            jnp.float32(req.temperature),
            jnp.int32(req.top_k),
            jnp.float32(req.top_p),
            jnp.bool_(req.do_sample),
            jnp.float32(req.repetition_penalty),
        )
        guide = None
        if req.guided_token_seqs:
            seqs = [list(map(int, s)) for s in req.guided_token_seqs if len(s)]
            if seqs:
                guide = {"seqs": seqs, "pos": 0}
        self._guides[slot] = guide
        allow_row = self._allow_row_for(guide)
        self._allow = self._allow.at[slot].set(allow_row)
        tok, seen_row = _first_token(last, sub, cfg_arrays, seen_row, allow_row)
        self._cache, self._seen = _insert_slot(
            self._cache, slot_cache, jnp.int32(slot), self._seen, seen_row
        )
        if self._draft_cache is not None:
            _, dslot_cache, _ = _engine_prefill(
                self.draft_params, self.draft_config,
                jnp.asarray(padded), true_len, self.max_len, self.kv_dtype,
            )
            self._draft_cache, self._seen = _insert_slot(
                self._draft_cache, dslot_cache, jnp.int32(slot),
                self._seen, seen_row,
            )
        self._tokens = self._tokens.at[slot].set(tok)
        self._slots[slot] = req
        self._emitted[slot] = 0
        # the prefill already produced the first token — emit it now
        self._emit(slot, int(tok))
        self._post_emit(slot, int(tok))

    def _allow_row_for(self, guide) -> jnp.ndarray:
        V = self.config.vocab_size
        if guide is None:
            return jnp.ones((V,), jnp.bool_)
        row = np.zeros((V,), bool)
        pos = guide["pos"]
        for seq in guide["seqs"]:
            if len(seq) > pos:
                row[seq[pos]] = True
        if not row.any():  # degenerate guide: unconstrain rather than stall
            row[:] = True
        return jnp.asarray(row)

    def _post_emit(self, slot: int, token: int) -> None:
        """Advance the slot's guided-choice state after a token emits;
        finish on the shortest complete match; clear state on slot exit."""
        if self._slots[slot] is None:
            if self._guides[slot] is not None:  # slot ended some other way
                self._guides[slot] = None
                self._allow = self._allow.at[slot].set(True)
            return
        g = self._guides[slot]
        if g is None:
            return
        pos = g["pos"]
        g["seqs"] = [s for s in g["seqs"] if len(s) > pos and s[pos] == token]
        g["pos"] = pos + 1
        complete = (not g["seqs"]) or any(
            len(s) == g["pos"] for s in g["seqs"]
        )
        if complete:
            req = self._slots[slot]
            req.out.put(EngineRequest._DONE)
            self._slots[slot] = None
            self._total_requests += 1
            self._guides[slot] = None
            self._allow = self._allow.at[slot].set(True)
        else:
            self._allow = self._allow.at[slot].set(self._allow_row_for(g))

    def _emit(self, slot: int, token: int) -> None:
        req = self._slots[slot]
        if req is None:
            return
        done = False
        if req.cancelled:
            done = True
        elif req.eos_token_id is not None and token == req.eos_token_id:
            done = True
        else:
            req.out.put(token)
            self._emitted[slot] += 1
            self._total_tokens += 1
            if self._emitted[slot] >= req.max_new_tokens:
                done = True
        # slot position exhaustion: cache is full (speculative steps write up
        # to gamma+1 positions at once, so they need that much headroom)
        headroom = (self.gamma + 1) if self._draft_cache is not None else 1
        if not done and self._emitted[slot] + len(req.prompt_ids) >= self.max_len - headroom:
            done = True
        if done:
            req.out.put(EngineRequest._DONE)
            self._slots[slot] = None
            self._total_requests += 1

    def _loop(self) -> None:
        while not self._stop.is_set():
            # admit pending requests into free slots
            admitted = False
            for slot in range(self.max_slots):
                if self._slots[slot] is None:
                    try:
                        req = self._pending.get_nowait()
                        while req.cancelled:  # dropped before admission
                            req.out.put(EngineRequest._DONE)
                            req = self._pending.get_nowait()
                    except queue.Empty:
                        break
                    self._admit(req, slot)
                    admitted = True
            if not any(s is not None for s in self._slots):
                if not admitted:
                    self._wake.wait(timeout=0.05)
                    self._wake.clear()
                continue
            # one decode step for the whole pool
            if self._draft_cache is not None:
                (out_tokens, out_count, self._tokens, self._cache,
                 self._draft_cache, self._rng, self._seen) = _spec_engine_step(
                    self.params, self.config,
                    self.draft_params, self.draft_config,
                    self._cache, self._draft_cache,
                    self._tokens, self._rng,
                    jnp.asarray(self._temp),
                    jnp.asarray(self._topk),
                    jnp.asarray(self._topp),
                    jnp.asarray(self._dos),
                    jnp.asarray(self._rep),
                    self._seen,
                    self._allow,
                    self.gamma,
                )
                self._steps += 1
                ot, oc = np.asarray(out_tokens), np.asarray(out_count)
                for slot in range(self.max_slots):
                    for j in range(int(oc[slot])):
                        if self._slots[slot] is None:
                            break  # EOS/limit mid-step: drop the tail
                        t = int(ot[slot, j])
                        self._emit(slot, t)
                        self._post_emit(slot, t)
            else:
                self._tokens, self._cache, self._rng, self._seen = _engine_step(
                    self.params,
                    self.config,
                    self._cache,
                    self._tokens,
                    self._rng,
                    jnp.asarray(self._temp),
                    jnp.asarray(self._topk),
                    jnp.asarray(self._topp),
                    jnp.asarray(self._dos),
                    jnp.asarray(self._rep),
                    self._seen,
                    self._allow,
                )
                self._steps += 1
                toks = np.asarray(self._tokens)
                for slot in range(self.max_slots):
                    if self._slots[slot] is not None:
                        t = int(toks[slot])
                        self._emit(slot, t)
                        self._post_emit(slot, t)

    # ----------------------------- conveniences -----------------------------

    def generate(self, prompt_ids, **kw) -> list[int]:
        """Blocking single request → list of token ids."""
        req = self.submit(EngineRequest(np.asarray(prompt_ids, np.int32), **kw))
        return list(req.tokens())
