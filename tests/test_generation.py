"""Generation tests: sampling ops, streaming loop, compiled loop, KV policies."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_init_params,
)
from intel_extension_for_transformers_tpu.models.generation import (
    SamplingConfig,
    generate,
    generate_compiled,
    generate_stream,
    sample_logits,
)


@pytest.fixture(scope="module")
def tiny_model():
    config = LlamaConfig.tiny()
    params = llama_init_params(jax.random.PRNGKey(0), config)
    return params, config


def test_sample_greedy():
    logits = jnp.asarray([[0.0, 5.0, 1.0], [3.0, 0.0, -1.0]])
    out = sample_logits(logits, jax.random.PRNGKey(0), SamplingConfig())
    np.testing.assert_array_equal(np.asarray(out), [1, 0])


def test_sample_top_k_restricts_support():
    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 10.0]] * 64)
    cfg = SamplingConfig(do_sample=True, top_k=2, temperature=1.0)
    out = np.asarray(sample_logits(logits, jax.random.PRNGKey(1), cfg))
    assert set(out.tolist()) <= {3, 4}


def test_sample_top_p_restricts_support():
    # one dominant token: top_p=0.5 should only ever pick it
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]] * 64)
    cfg = SamplingConfig(do_sample=True, top_p=0.5)
    out = np.asarray(sample_logits(logits, jax.random.PRNGKey(2), cfg))
    assert set(out.tolist()) == {0}


def test_repetition_penalty_discourages_seen():
    logits = jnp.asarray([[2.0, 1.9]])
    seen = jnp.asarray([[True, False]])
    cfg = SamplingConfig(repetition_penalty=2.0)
    out = sample_logits(logits, jax.random.PRNGKey(0), cfg, seen)
    assert int(out[0]) == 1  # token 0 penalized 2.0→1.0, token 1 wins


def test_generate_stream_yields_tokens(tiny_model):
    params, config = tiny_model
    ids = np.random.default_rng(0).integers(0, 256, size=(1, 8))
    toks = list(generate_stream(params, config, ids, SamplingConfig(max_new_tokens=5)))
    assert len(toks) == 5
    assert all(t.shape == (1,) for t in toks)


def test_generate_greedy_deterministic(tiny_model):
    params, config = tiny_model
    ids = np.random.default_rng(1).integers(0, 256, size=(2, 6))
    a = generate(params, config, ids, SamplingConfig(max_new_tokens=6))
    b = generate(params, config, ids, SamplingConfig(max_new_tokens=6))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 6)


def test_generate_compiled_matches_stream_greedy(tiny_model):
    params, config = tiny_model
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, size=(1, 8)))
    cfg = SamplingConfig(max_new_tokens=6)
    stream_out = generate(params, config, np.asarray(ids), cfg, cache_dtype=jnp.float32)
    comp_out, lengths = generate_compiled(params, config, ids, cfg, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(comp_out), stream_out)
    assert int(lengths[0]) == 6


def test_generate_eos_stops(tiny_model):
    params, config = tiny_model
    ids = np.random.default_rng(3).integers(0, 256, size=(1, 4))
    # pick the token greedy decode emits first, use it as "eos"
    first = generate(params, config, ids, SamplingConfig(max_new_tokens=1))[0, 0]
    out = generate(
        params, config, ids, SamplingConfig(max_new_tokens=10, eos_token_id=int(first))
    )
    assert out.shape[1] == 1  # stopped immediately at eos


def test_h2o_policy_generates_under_budget(tiny_model):
    from intel_extension_for_transformers_tpu.models.kv_policies import H2OKVPolicy

    params, config = tiny_model
    ids = np.random.default_rng(4).integers(0, 256, size=(1, 12))
    policy = H2OKVPolicy(budget=16, recent_size=4)
    # 12 prompt + 10 new > 16 budget → eviction must kick in and still decode
    toks = list(
        generate_stream(
            params,
            config,
            ids,
            SamplingConfig(max_new_tokens=10),
            kv_policy=policy,
            cache_dtype=jnp.float32,
        )
    )
    assert len(toks) == 10


def test_h2o_policy_matches_full_cache_within_budget(tiny_model):
    from intel_extension_for_transformers_tpu.models.kv_policies import H2OKVPolicy

    params, config = tiny_model
    ids = np.random.default_rng(5).integers(0, 256, size=(1, 6))
    cfg = SamplingConfig(max_new_tokens=5)
    ref = generate(params, config, ids, cfg, cache_dtype=jnp.float32)
    # budget large enough → no eviction → identical greedy path
    policy = H2OKVPolicy(budget=64, recent_size=8)
    out = generate(
        params, config, ids, cfg, kv_policy=policy, cache_dtype=jnp.float32
    )
    np.testing.assert_array_equal(out, ref)


def test_attention_sink_policy(tiny_model):
    from intel_extension_for_transformers_tpu.models.kv_policies import (
        AttentionSinkKVPolicy,
    )

    params, config = tiny_model
    ids = np.random.default_rng(6).integers(0, 256, size=(1, 10))
    policy = AttentionSinkKVPolicy(budget=16, sink_size=4)
    toks = list(
        generate_stream(
            params,
            config,
            ids,
            SamplingConfig(max_new_tokens=12),
            kv_policy=policy,
            cache_dtype=jnp.float32,
        )
    )
    assert len(toks) == 12


def test_policy_prompt_exceeds_budget_raises(tiny_model):
    from intel_extension_for_transformers_tpu.models.kv_policies import H2OKVPolicy

    params, config = tiny_model
    ids = np.random.default_rng(7).integers(0, 256, size=(1, 30))
    policy = H2OKVPolicy(budget=16)
    with pytest.raises(ValueError):
        list(generate_stream(params, config, ids, SamplingConfig(max_new_tokens=2),
                             kv_policy=policy))
