"""INT8 KV cache tests: accuracy vs the bf16 cache, memory halving, engine
integration (beyond the reference — its runtimes keep fp16/bf16 KV)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    _kv_quantize,
    init_kv_cache,
    llama_apply,
    llama_init_params,
)


@pytest.fixture(scope="module")
def tiny():
    config = LlamaConfig.tiny(vocab_size=128, hidden_size=64,
                              intermediate_size=128)
    params = llama_init_params(jax.random.PRNGKey(0), config)
    return params, config


def test_kv_quantize_error_bound():
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(size=(2, 8, 4, 16)).astype(np.float32))
    q, sc = _kv_quantize(t)
    assert q.dtype == jnp.int8 and sc.shape == (2, 8, 4)
    deq = np.asarray(q, np.float32) * np.asarray(sc)[..., None]
    err = np.abs(deq - np.asarray(t))
    assert (err <= 0.5 * np.asarray(sc)[..., None] + 1e-6).all()


def test_int8_cache_logits_close_and_memory_halved(tiny):
    params, config = tiny
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, 128, (1, 24)), jnp.int32
    )
    cache_f = init_kv_cache(config, 1, 48)
    cache_q = init_kv_cache(config, 1, 48, dtype="int8")
    assert cache_q.quantized and not cache_f.quantized

    def bytes_of(c):
        return sum(
            x.size * x.dtype.itemsize
            for x in jax.tree.leaves((c.k, c.v, c.k_scale, c.v_scale))
        )

    # int8 codes + one f32 scale per D-vector: at this test's tiny D=16 the
    # scale overhead is 4B/16 elems → 0.625×; at real D=128 it's ~0.53×
    assert bytes_of(cache_q) <= 0.63 * bytes_of(cache_f)

    lf, cache_f = llama_apply(params, config, ids, cache_f)
    lq, cache_q = llama_apply(params, config, ids, cache_q)
    assert int(cache_q.length) == 24
    # int8 KV noise is small relative to logit scale
    ref = np.asarray(lf, np.float32)
    got = np.asarray(lq, np.float32)
    assert np.abs(got - ref).max() < 0.15 * np.abs(ref).max()

    # decode continues from the quantized cache
    for t in range(3):
        tok = jnp.argmax(lq[:, -1:], axis=-1).astype(jnp.int32)
        lq, cache_q = llama_apply(params, config, tok, cache_q)
    assert int(cache_q.length) == 27
    assert np.isfinite(np.asarray(lq)).all()


def test_int8_cache_greedy_decode_matches_bf16(tiny):
    """At tiny scale the int8-KV greedy trajectory should match bf16 —
    token-exact here (and near-exact in general)."""
    from intel_extension_for_transformers_tpu.models.generation import (
        SamplingConfig,
        generate,
    )

    params, config = tiny
    prompt = np.array([5, 17, 99, 3], np.int32)
    ref = generate(params, config, prompt, SamplingConfig(max_new_tokens=12))[0]

    from intel_extension_for_transformers_tpu.models.registry import (
        get_apply_fn,
    )

    apply_fn = get_apply_fn(config)
    cache = init_kv_cache(config, 1, 64, dtype="int8")
    ids = jnp.asarray(prompt[None])
    logits, cache = apply_fn(params, config, ids, cache)
    toks = []
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    for _ in range(12):
        toks.append(int(tok[0, 0]))
        logits, cache = apply_fn(params, config, tok, cache)
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    agree = (np.array(toks) == np.array(ref)).mean()
    assert agree >= 0.9, (toks, list(ref))


def test_engine_int8_kv_with_speculation(tiny):
    """int8 KV composes with the speculative slot pool (both caches
    quantized, scale planes scattered on insert)."""
    from intel_extension_for_transformers_tpu.models.engine import (
        DecodeEngine,
        EngineRequest,
    )

    params, config = tiny
    eng = DecodeEngine(
        params, config, max_slots=2, max_len=64, kv_dtype="int8",
        draft_params=params, draft_config=config, num_speculative_tokens=3,
    ).start()
    try:
        prompt = np.array([4, 2, 1], np.int32)
        s0 = eng._steps
        outs = [
            list(eng.submit(EngineRequest(prompt, max_new_tokens=12)).tokens())
            for _ in range(2)
        ]
        assert all(len(o) == 12 for o in outs)
        assert outs[0] == outs[1]
        # self-draft on identical caches: near-full acceptance
        assert eng._steps - s0 <= 10
    finally:
        eng.stop()


def test_engine_int8_kv(tiny):
    """Continuous-batching engine on an int8 KV pool: concurrent requests
    complete with deterministic greedy output."""
    from intel_extension_for_transformers_tpu.models.engine import (
        DecodeEngine,
        EngineRequest,
    )

    params, config = tiny
    eng = DecodeEngine(
        params, config, max_slots=2, max_len=64, kv_dtype="int8"
    ).start()
    try:
        prompt = np.array([9, 8, 7], np.int32)
        reqs = [
            eng.submit(EngineRequest(prompt, max_new_tokens=8))
            for _ in range(3)
        ]
        outs = [list(r.tokens()) for r in reqs]
        assert all(len(o) == 8 for o in outs)
        assert outs[0] == outs[1] == outs[2]  # deterministic across slots
    finally:
        eng.stop()
