"""Engine KV-eviction policies + chunked prefill (VERDICT round-2 #2/#3).

Reference contracts:
- H2O in-generation eviction: kv_cache_compression/prune/h2o.py:138
  (H2OKVCache.__call__ top-k eviction inside the attention forward).
- StreamingLLM sinks: modeling_gaudi/streaming_llm.py:37 + neural-speed
  shift-RoPE ring (docs/streamingllm.md:19-25).
- Chunked prefill: the reference adopts vLLM for serving concurrency
  (modeling_auto.py:364-533); here admissions interleave with decode steps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.llama import (
    KVCache,
    LlamaConfig,
    init_kv_cache,
    llama_apply,
    llama_init_params,
)
from intel_extension_for_transformers_tpu.models.decoder import (
    DecoderConfig,
    decoder_init_params,
)
from intel_extension_for_transformers_tpu.models.engine import (
    DecodeEngine,
    EngineRequest,
    _compact_cache_slot,
    _rope_spec,
)
from intel_extension_for_transformers_tpu.ops.layers import (
    rope_inv_freq,
)


@pytest.fixture(scope="module")
def tiny():
    config = LlamaConfig.tiny(vocab_size=256, hidden_size=64,
                              intermediate_size=128)
    params = llama_init_params(jax.random.PRNGKey(0), config)
    return params, config


# ------------------------- compaction mechanics -------------------------


def test_sink_compaction_rotation_exact(tiny):
    """Mechanical oracle: after sink compaction, sink keys are bit-identical
    and moved recent keys equal an independent delta-rotation of the
    originals (RoPE angles are linear in position, so re-rotation by
    new-old is exact); values move unrotated."""
    params, config = tiny
    S, L_fill, sink, recent = 64, 48, 4, 16
    cache = init_kv_cache(config, 1, S)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, L_fill), 0, 256)
    _, cache = llama_apply(params, config, ids, cache)
    # engine layout: leaves (slots=1, B=1, S, Hkv, D), vector length
    bc = KVCache(k=[c[None] for c in cache.k], v=[c[None] for c in cache.v],
                 length=jnp.full((1,), L_fill, jnp.int32))

    keep = np.concatenate(
        [np.arange(sink), np.arange(L_fill - recent, L_fill)]
    ).astype(np.int32)
    out = _compact_cache_slot(bc, jnp.int32(0), jnp.asarray(keep),
                              _rope_spec(config))
    K = len(keep)
    assert int(out.length[0]) == K

    inv = np.asarray(rope_inv_freq(config.head_dim, config.rope_theta))
    for li in range(config.num_hidden_layers):
        old_k = np.asarray(cache.k[li][0], np.float32)  # (S, Hkv, D)
        new_k = np.asarray(out.k[li][0, 0], np.float32)
        old_v = np.asarray(cache.v[li][0], np.float32)
        new_v = np.asarray(out.v[li][0, 0], np.float32)
        # sinks: unmoved, bit-identical
        np.testing.assert_array_equal(new_k[:sink], old_k[:sink])
        np.testing.assert_array_equal(new_v[:K], old_v[keep])
        # recent block: rotated by its (constant) delta
        delta = float(sink + recent - L_fill)
        ang = delta * inv  # (D/2,)
        c, s = np.cos(ang), np.sin(ang)
        blk = old_k[L_fill - recent:L_fill]  # (R, Hkv, D)
        x1, x2 = np.split(blk, 2, axis=-1)
        expect = np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
        np.testing.assert_allclose(
            new_k[sink:K], expect, rtol=0, atol=2e-2
        )  # bf16 storage


def test_compaction_partial_interleaved_rope(tiny):
    """GPT-J-style partial interleaved RoPE: only the first rotary_dim dims
    rotate; the pass-through tail must be preserved exactly."""
    config = DecoderConfig.tiny(rotary_pct=0.5, rotary_interleaved=True)
    params = decoder_init_params(jax.random.PRNGKey(0), config)
    from intel_extension_for_transformers_tpu.models.decoder import decoder_apply

    S, L_fill, sink, recent = 32, 24, 2, 8
    cache = init_kv_cache(config, 1, S)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, L_fill), 0, 512)
    _, cache = decoder_apply(params, config, ids, cache)
    bc = KVCache(k=[c[None] for c in cache.k], v=[c[None] for c in cache.v],
                 length=jnp.full((1,), L_fill, jnp.int32))
    keep = np.concatenate(
        [np.arange(sink), np.arange(L_fill - recent, L_fill)]
    ).astype(np.int32)
    out = _compact_cache_slot(bc, jnp.int32(0), jnp.asarray(keep),
                              _rope_spec(config))
    rd = config.rotary_dim
    old_k = np.asarray(cache.k[0][0], np.float32)
    new_k = np.asarray(out.k[0][0, 0], np.float32)
    # non-rotary tail moves but never changes value
    np.testing.assert_array_equal(
        new_k[: len(keep), :, rd:], old_k[keep][:, :, rd:]
    )
    # rotated part: delta-rotation oracle (interleaved pairs)
    inv = np.asarray(rope_inv_freq(rd, config.rope_theta))
    delta = float(sink + recent - L_fill)
    c, s = np.cos(delta * inv), np.sin(delta * inv)
    blk = old_k[L_fill - recent:L_fill][:, :, :rd]
    x1, x2 = blk[..., ::2], blk[..., 1::2]
    expect = np.stack([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1).reshape(
        blk.shape
    )
    np.testing.assert_allclose(new_k[sink:len(keep), :, :rd], expect,
                               atol=2e-2)


# ------------------------- policies in the engine -------------------------


def test_sink_policy_serves_past_max_len(tiny):
    """A slot generates far past max_len from a bounded cache — the round-2
    gap where the slot simply terminated (engine.py:540-542 then)."""
    params, config = tiny
    eng = DecodeEngine(
        params, config, max_slots=2, max_len=64,
        kv_policy="sink", kv_sink=4, kv_recent=24,
    ).start()
    try:
        out = eng.generate(np.arange(1, 9, dtype=np.int32),
                           max_new_tokens=150)
        assert len(out) == 150
        assert eng._compactions >= 2
        assert eng.active_slots == 0
        assert int(eng._host_len[0]) <= 64
        # deterministic: a second identical run reproduces the stream
        out2 = eng.generate(np.arange(1, 9, dtype=np.int32),
                            max_new_tokens=150)
        assert out == out2
    finally:
        eng.stop()


def test_h2o_policy_serves_past_max_len(tiny):
    """H2O heavy-hitter eviction as an engine slot policy: accumulated
    attention mass is tracked per key (tap in ops/layers.attention) and the
    keep set is heavy ∪ recent."""
    params, config = tiny
    eng = DecodeEngine(
        params, config, max_slots=2, max_len=64,
        kv_policy="h2o", kv_heavy=16, kv_recent=16,
    ).start()
    try:
        out = eng.generate(np.arange(1, 9, dtype=np.int32),
                           max_new_tokens=120)
        assert len(out) == 120
        assert eng._compactions >= 2
        # the mass statistic is live: nonzero where the cache is filled
        acc = np.asarray(eng._accum[0])
        assert acc[: int(eng._host_len[0])].sum() > 0
    finally:
        eng.stop()


def test_sink_policy_composes_int8_kv(tiny):
    """Eviction + int8 KV cache: compaction dequantizes, rotates, and
    requantizes the kept keys."""
    params, config = tiny
    eng = DecodeEngine(
        params, config, max_slots=2, max_len=64, kv_dtype="int8",
        kv_policy="sink", kv_sink=4, kv_recent=24,
    ).start()
    try:
        out = eng.generate(np.arange(1, 9, dtype=np.int32),
                           max_new_tokens=120)
        assert len(out) == 120 and eng._compactions >= 2
    finally:
        eng.stop()


def test_sink_policy_composes_speculative(tiny):
    """Eviction + speculative decoding: both caches compact with the same
    kept set; the step needs gamma+1 headroom."""
    params, config = tiny
    eng = DecodeEngine(
        params, config, max_slots=2, max_len=64,
        draft_params=params, draft_config=config, num_speculative_tokens=3,
        kv_policy="sink", kv_sink=4, kv_recent=24,
    ).start()
    try:
        out = eng.generate(np.arange(1, 9, dtype=np.int32),
                           max_new_tokens=120)
        assert len(out) == 120 and eng._compactions >= 2
        out2 = eng.generate(np.arange(1, 9, dtype=np.int32),
                            max_new_tokens=120)
        assert out == out2  # greedy determinism under spec + eviction
    finally:
        eng.stop()


def test_policy_keep_size_validation(tiny):
    params, config = tiny
    with pytest.raises(ValueError):
        DecodeEngine(params, config, max_len=32,
                     kv_policy="sink", kv_sink=4, kv_recent=32)
    with pytest.raises(ValueError):
        DecodeEngine(params, config, kv_policy="lru")


# --------------------------- chunked prefill ---------------------------


def test_chunked_prefill_no_head_of_line_blocking(tiny):
    """While a long prompt admits, an active stream keeps emitting: one
    chunk per loop iteration interleaves with decode steps (round-2 gap:
    _admit ran the whole prefill inline, stalling every stream)."""
    params, config = tiny
    eng = DecodeEngine(params, config, max_slots=2, max_len=512,
                       prefill_chunk=16).start()
    try:
        a = eng.submit(EngineRequest(np.array([3, 1, 4], np.int32),
                                     max_new_tokens=400))
        it = a.tokens()
        for _ in range(3):
            next(it)
        # long admission: 160 tokens → 10 chunks of 16
        b = eng.submit(EngineRequest(
            np.arange(1, 161, dtype=np.int32) % 250, max_new_tokens=4))
        got_during_admission = 0
        while b.out.qsize() == 0 and got_during_admission < 50:
            next(it)
            got_during_admission += 1
        # ≥ half the chunk count of tokens flowed to A while B admitted
        assert got_during_admission >= 5, got_during_admission
        assert eng._chunks >= 10
        a.cancel()
        assert list(b.tokens())  # B completes too
    finally:
        eng.stop()


def test_chunked_prefill_greedy_parity(tiny):
    """Chunked admission is numerically identical to one-shot prefill: the
    engine's greedy output equals the single-request reference for a prompt
    spanning several chunks."""
    from intel_extension_for_transformers_tpu.models.generation import (
        SamplingConfig,
        generate,
    )

    params, config = tiny
    prompt = (np.arange(1, 41, dtype=np.int32) * 7) % 251
    ref = generate(params, config, prompt, SamplingConfig(max_new_tokens=12))[0]
    eng = DecodeEngine(params, config, max_slots=2, max_len=128,
                       prefill_chunk=16).start()
    try:
        out = eng.generate(prompt, max_new_tokens=12)
        np.testing.assert_array_equal(ref, np.array(out))
        assert eng._chunks >= 3  # really went through the chunked path
    finally:
        eng.stop()


def test_guided_choice_device_state_growth(tiny):
    """Two guided requests with different seq shapes exercise the
    high-water-mark growth of the device GuideState; outputs stay exact."""
    params, config = tiny
    eng = DecodeEngine(params, config, max_slots=2, max_len=64).start()
    try:
        out = eng.generate(np.array([5, 6], np.int32), max_new_tokens=8,
                           guided_token_seqs=[[9, 10], [9, 11]])
        assert out in ([9, 10], [9, 11])
        # a larger guide that cannot complete on its first token grows the
        # device (S, L) caps (guides finishing at token 1 never touch them)
        seqs = [[40, 41, 42, 43, 44, 45], [40, 41, 52], [40, 61, 62, 63]]
        out2 = eng.generate(np.array([5, 6], np.int32), max_new_tokens=8,
                            guided_token_seqs=seqs)
        assert out2 in seqs
        assert eng._guide.seqs.shape[1] >= 3
        assert eng._guide.seqs.shape[2] >= 6
    finally:
        eng.stop()


def test_long_prompt_ingestion_under_policy(tiny):
    """With a kv_policy, prompts LONGER than max_len stream in: admission
    compacts between prefill chunks (long-document ingestion — the
    StreamingLLM input story; without a policy such prompts are rejected)."""
    params, config = tiny
    long_prompt = (np.arange(1, 201, dtype=np.int32) * 3) % 250  # 200 ≫ 64
    eng = DecodeEngine(
        params, config, max_slots=2, max_len=64, prefill_chunk=16,
        kv_policy="sink", kv_sink=4, kv_recent=24,
    ).start()
    try:
        out = eng.generate(long_prompt, max_new_tokens=20)
        assert len(out) == 20
        assert eng._compactions >= 3  # several mid-admission evictions
        assert int(eng._host_len[0]) <= 64
        out2 = eng.generate(long_prompt, max_new_tokens=20)
        assert out == out2  # deterministic
    finally:
        eng.stop()

    # h2o policy ingests long prompts too (mass compacts alongside)
    eng = DecodeEngine(
        params, config, max_slots=2, max_len=64, prefill_chunk=16,
        kv_policy="h2o", kv_heavy=16, kv_recent=16,
    ).start()
    try:
        out = eng.generate(long_prompt, max_new_tokens=12)
        assert len(out) == 12 and eng._compactions >= 3
    finally:
        eng.stop()

    # without a policy the old rejection stands
    eng = DecodeEngine(params, config, max_slots=2, max_len=64)
    with pytest.raises(ValueError):
        eng.submit(EngineRequest(long_prompt))
