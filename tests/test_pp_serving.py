"""Pipeline-parallel serving (VERDICT round-2 #7): pp×tp decode in the
continuous-batching engine, exact greedy parity with single-device decode.

Beyond the reference (SURVEY.md §2.3: PP absent; serving TP is DeepSpeed
AutoTP, model_utils.py:249-291)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    init_kv_cache,
    llama_apply,
    llama_init_params,
)
from intel_extension_for_transformers_tpu.models.engine import (
    DecodeEngine,
    EngineRequest,
)
from intel_extension_for_transformers_tpu.models.generation import (
    SamplingConfig,
    generate,
)
from intel_extension_for_transformers_tpu.parallel import create_mesh
from intel_extension_for_transformers_tpu.parallel.pp_serve import (
    build_pp_serve_state,
    pp_apply,
    pp_init_cache,
)


@pytest.fixture(scope="module")
def setup():
    config = LlamaConfig.tiny(vocab_size=256, hidden_size=64,
                              intermediate_size=128)
    params = llama_init_params(jax.random.PRNGKey(0), config)
    mesh = create_mesh(dp=-1, pp=2, tp=2)  # 2×2×2 on the 8-dev CPU mesh
    state = build_pp_serve_state(params, config, mesh)
    return params, config, mesh, state


def test_pp_apply_matches_llama_apply(setup):
    """Direct parity: pipelined prefill + 4 decode steps produce the same
    logits trajectory as the single-device apply (bf16 cache both sides)."""
    params, config, mesh, state = setup
    B, T, max_len = 2, 8, 32
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 256)

    ref_cache = init_kv_cache(config, B, max_len)
    ref_logits, ref_cache = llama_apply(params, config, ids, ref_cache)

    cache = pp_init_cache(state, config, B, max_len)
    ones = jnp.full((B,), T, jnp.int32)
    logits, cache = pp_apply(state, config, ids, cache, ones,
                             jnp.ones((B,), bool))
    np.testing.assert_allclose(
        np.asarray(logits, np.float32), np.asarray(ref_logits, np.float32),
        atol=2e-2, rtol=0,
    )
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    ref_tok = jnp.argmax(ref_logits[:, -1], axis=-1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
    for _ in range(4):
        # both rows share the prompt length, so the scalar-length reference
        # cache can decode them in one batched call
        ref_lg, ref_cache = llama_apply(
            params, config, ref_tok[:, None], ref_cache
        )
        lg, cache = pp_apply(
            state, config, tok[:, None], cache,
            jnp.ones((B,), jnp.int32), jnp.ones((B,), bool),
        )
        tok = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        ref_tok = jnp.argmax(ref_lg[:, -1], axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))


def test_pp_engine_greedy_parity(setup):
    """The engine in pp×tp mode reproduces single-device greedy output for
    concurrent requests — the multi-chip pipelined serving configuration."""
    params, config, mesh, state = setup
    eng = DecodeEngine(params, config, max_slots=2, max_len=64,
                       prefill_chunk=16, pp_state=state).start()
    try:
        prompts = [np.array([5, 17, 99, 3], np.int32),
                   (np.arange(1, 25, dtype=np.int32) * 3) % 250]
        reqs = [eng.submit(EngineRequest(p, max_new_tokens=10))
                for p in prompts]
        outs = [list(r.tokens()) for r in reqs]
        for p, out in zip(prompts, outs):
            ref = generate(params, config, p,
                           SamplingConfig(max_new_tokens=10))[0]
            np.testing.assert_array_equal(ref, np.array(out))
        # slot reuse after completion exercises the in-place length reset
        out2 = eng.generate(prompts[0], max_new_tokens=10)
        np.testing.assert_array_equal(np.array(outs[0]), np.array(out2))
    finally:
        eng.stop()


def test_pp_engine_rejects_unsupported_combos(setup):
    # int8 KV, sink/h2o eviction, and speculative drafts all compose with
    # pp now (tests/test_pp_int8_kv.py); what remains invalid is an
    # unsupported KV dtype and unknown policies
    params, config, mesh, state = setup
    with pytest.raises(ValueError):
        DecodeEngine(params, config, pp_state=state, kv_dtype="float16")
    with pytest.raises(ValueError):
        DecodeEngine(params, config, pp_state=state, kv_policy="nope")
