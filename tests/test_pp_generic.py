"""Pipeline-parallel serving for the GENERIC decoder families (beyond the
llama family): rope-partial/interleaved, ALiBi, learned positions,
LayerNorm, parallel residual, proj biases, MQA-replicated KV — all through
`parallel/pp_serve.py` on a pp×tp mesh, parity-pinned against
models/decoder.py:decoder_apply (reference families: modeling_auto.py:325-347;
PP itself is beyond the reference, SURVEY.md §2.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.decoder import (
    DecoderConfig,
    decoder_apply,
    decoder_init_params,
)
from intel_extension_for_transformers_tpu.models.engine import (
    DecodeEngine,
    EngineRequest,
)
from intel_extension_for_transformers_tpu.models.generation import (
    SamplingConfig,
    generate,
)
from intel_extension_for_transformers_tpu.models.llama import init_kv_cache
from intel_extension_for_transformers_tpu.parallel import create_mesh
from intel_extension_for_transformers_tpu.parallel.pp_serve import (
    build_pp_serve_state,
    pp_apply,
    pp_init_cache,
)


def _parity(config, seed=0, tp=2, kv_dtype=None, atol=2e-2):
    """pp prefill + 4 decode steps vs single-device decoder_apply."""
    params = decoder_init_params(jax.random.PRNGKey(seed), config)
    if config.lm_head_bias:  # zeros-init would make the bias-add vacuous
        params["lm_head"]["bias"] = (
            jax.random.normal(jax.random.PRNGKey(seed + 1),
                              (config.vocab_size,)) * 0.3
        )
    mesh = create_mesh(dp=-1, pp=2, tp=tp)
    state = build_pp_serve_state(params, config, mesh)
    B, T, max_len = 2, 8, 32
    ids = jax.random.randint(
        jax.random.PRNGKey(seed + 2), (B, T), 0, config.vocab_size
    )

    ref_cache = init_kv_cache(config, B, max_len)
    ref_logits, ref_cache = decoder_apply(params, config, ids, ref_cache)

    cache = pp_init_cache(state, config, B, max_len,
                          dtype=kv_dtype or jnp.bfloat16)
    logits, cache = pp_apply(
        state, config, ids, cache, jnp.full((B,), T, jnp.int32),
        jnp.ones((B,), bool),
    )
    if kv_dtype is None:
        np.testing.assert_allclose(
            np.asarray(logits, np.float32),
            np.asarray(ref_logits, np.float32), atol=atol, rtol=0,
        )
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    ref_tok = jnp.argmax(ref_logits[:, -1], axis=-1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
    for _ in range(4):
        ref_lg, ref_cache = decoder_apply(
            params, config, ref_tok[:, None], ref_cache
        )
        lg, cache = pp_apply(
            state, config, tok[:, None], cache,
            jnp.ones((B,), jnp.int32), jnp.ones((B,), bool),
        )
        tok = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        ref_tok = jnp.argmax(ref_lg[:, -1], axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
    return params, config


def test_pp_gptj_style():
    """GPT-J flags: partial interleaved rotary, parallel residual with a
    SHARED ln, gelu_new, mlp biases, lm_head bias."""
    _parity(DecoderConfig.tiny(
        model_type="gptj", rotary_pct=0.5, rotary_interleaved=True,
        parallel_residual=True, shared_ln=True, attention_bias=False,
        mlp_bias=True, lm_head_bias=True, activation="gelu_new",
    ))


def test_pp_bloom_style():
    """BLOOM flags: ALiBi positions, LayerNorm with bias everywhere,
    embedding LayerNorm, sequential residual."""
    _parity(DecoderConfig.tiny(
        model_type="bloom", pos_embedding="alibi", attention_bias=True,
        mlp_bias=True, embedding_norm=True, activation="gelu",
    ))


def test_pp_neox_style_dual_ln():
    """NeoX flags: parallel residual with TWO norms (no shared ln)."""
    _parity(DecoderConfig.tiny(
        model_type="gpt_neox", rotary_pct=0.25, parallel_residual=True,
        shared_ln=False,
    ))


def test_pp_opt_style_learned_positions():
    """OPT flags: learned positions (with the +2 storage offset), relu."""
    _parity(DecoderConfig.tiny(
        model_type="opt", pos_embedding="learned", learned_pos_offset=2,
        activation="relu",
    ))


def test_pp_mqa_replicated_kv():
    """MQA (one KV head, GPT-BigCode/Falcon style): KV projections and
    cache replicate over tp while q stays sharded."""
    _parity(DecoderConfig.tiny(
        model_type="gpt_bigcode", num_key_value_heads=1,
    ))


def test_pp_generic_int8_kv():
    """int8 staged KV cache on a generic family: greedy trajectory matches
    the bf16 single-device oracle."""
    _parity(DecoderConfig.tiny(
        model_type="gptj", rotary_pct=0.5, rotary_interleaved=True,
        parallel_residual=True, shared_ln=True, attention_bias=False,
        mlp_bias=True, activation="gelu_new",
    ), kv_dtype="int8")


def test_pp_head_divisibility_errors():
    config = DecoderConfig.tiny(num_attention_heads=3,
                                num_key_value_heads=3)
    params = decoder_init_params(jax.random.PRNGKey(0), config)
    mesh = create_mesh(dp=-1, pp=2, tp=2)
    with pytest.raises(ValueError, match="not divisible by tp"):
        build_pp_serve_state(params, config, mesh)


def test_pp_engine_generic_greedy_parity():
    """The engine serves a generic family over pp×tp with exact greedy
    parity — including KV eviction (sink policy exercises the
    interleaved-partial-rope cache compaction on the staged pool)."""
    config = DecoderConfig.tiny(
        model_type="gptj", rotary_pct=0.5, rotary_interleaved=True,
        parallel_residual=True, shared_ln=True, attention_bias=False,
        mlp_bias=True, lm_head_bias=True, activation="gelu_new",
    )
    params = decoder_init_params(jax.random.PRNGKey(3), config)
    mesh = create_mesh(dp=-1, pp=2, tp=2)
    state = build_pp_serve_state(params, config, mesh)
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
    finally:
        eng.stop()

    # unbounded chat: sink eviction keeps the slot alive past max_len
    eng2 = DecodeEngine(params, config, max_slots=2, max_len=32,
                        prefill_chunk=16, pp_state=state,
                        kv_policy="sink", kv_sink=4, kv_recent=16).start()
    try:
        out = eng2.generate(np.array([5, 17, 99, 3], np.int32),
                            max_new_tokens=48)
        assert len(out) == 48
        assert eng2.stats().get("kv_compactions", 0) >= 1
    finally:
        eng2.stop()
