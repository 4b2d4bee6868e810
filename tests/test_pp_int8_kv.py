"""int8 KV cache composed with pipeline-parallel serving (pp×tp).

Closes the round-3 composition gap (COVERAGE.md: "PP serving covers bf16
llama-family only"): the staged KV cache stores int8 codes + per-row
scales, halving per-stage KV HBM, with the same quantize-at-write /
dequant-on-attend contract as the single-device int8 cache
(models/llama.py _kv_quantize; parity conventions from test_kv_quant.py —
int8 KV is near-exact at tiny scale, asserted as >=0.9 greedy agreement).
"""

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
    mesh = create_mesh(dp=-1, pp=2, tp=2)
    state = build_pp_serve_state(params, config, mesh)
    return params, config, mesh, state


def _bytes_of(tree):
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(tree)
        if hasattr(x, "dtype")
    )


def test_pp_int8_cache_memory_and_greedy_parity(setup):
    """Pipelined int8-KV greedy trajectory matches the single-device int8
    cache trajectory; staged cache bytes drop to ~half of bf16."""
    params, config, mesh, state = setup
    B, T, max_len = 2, 8, 48
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 256)

    cache_bf16 = pp_init_cache(state, config, B, max_len)
    cache = pp_init_cache(state, config, B, max_len, dtype="int8")
    # int8 codes + (S, Lr, B, Smax, Hkv) f32 scales vs bf16 codes
    assert _bytes_of(cache) < 0.70 * _bytes_of(cache_bf16)

    ref_cache = init_kv_cache(config, B, max_len, dtype="int8")
    ref_logits, ref_cache = llama_apply(params, config, ids, ref_cache)

    ones = jnp.full((B,), T, jnp.int32)
    logits, cache = pp_apply(state, config, ids, cache, ones,
                             jnp.ones((B,), bool))
    # same quantization decisions on both sides → near-identical logits
    np.testing.assert_allclose(
        np.asarray(logits[:, -1], np.float32),
        np.asarray(ref_logits[:, -1], np.float32),
        atol=3e-2, rtol=0,
    )
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    ref_tok = jnp.argmax(ref_logits[:, -1], axis=-1).astype(jnp.int32)
    agree, total = int(np.sum(np.asarray(tok) == np.asarray(ref_tok))), B
    for _ in range(6):
        ref_lg, ref_cache = llama_apply(
            params, config, ref_tok[:, None], ref_cache
        )
        lg, cache = pp_apply(
            state, config, tok[:, None], cache,
            jnp.ones((B,), jnp.int32), jnp.ones((B,), bool),
        )
        tok = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        ref_tok = jnp.argmax(ref_lg[:, -1], axis=-1).astype(jnp.int32)
        agree += int(np.sum(np.asarray(tok) == np.asarray(ref_tok)))
        total += B
    assert agree / total >= 0.9, f"greedy agreement {agree}/{total}"


def test_engine_pp_int8_kv_serves(setup):
    """DecodeEngine(pp_state=..., kv_dtype='int8') serves concurrent greedy
    slots and matches the single-device int8-KV engine output."""
    params, config, mesh, state = setup
    prompts = [[7, 3, 11], [5, 2]]

    def run(engine):
        reqs = [
            EngineRequest(prompt_ids=np.array(p, np.int32), max_new_tokens=10,
                          do_sample=False)
            for p in prompts
        ]
        engine.start()
        try:
            for r in reqs:
                engine.submit(r)
            return [list(r.tokens()) for r in reqs]
        finally:
            engine.stop()

    out_pp = run(DecodeEngine(params, config, max_slots=2, max_len=48,
                              kv_dtype="int8", pp_state=state))
    out_sd = run(DecodeEngine(params, config, max_slots=2, max_len=48,
                              kv_dtype="int8"))
    for a, b in zip(out_pp, out_sd):
        assert len(a) == len(b) == 10
        same = np.mean(np.array(a) == np.array(b))
        assert same >= 0.9, (a, b)


def _drain(engine, prompts, n_tokens):
    reqs = [
        EngineRequest(prompt_ids=np.array(p, np.int32),
                      max_new_tokens=n_tokens, do_sample=False)
        for p in prompts
    ]
    engine.start()
    try:
        for r in reqs:
            engine.submit(r)
        return [list(r.tokens()) for r in reqs]
    finally:
        engine.stop()


def test_pp_sink_eviction_unbounded_generation(setup):
    """A pp-served slot generates PAST max_len under the sink policy: the
    staged cache compacts in place (pp_compact_slot) instead of the slot
    terminating, and the greedy output matches the single-device engine
    running the identical policy."""
    params, config, mesh, state = setup
    kw = dict(max_slots=2, max_len=32, kv_policy="sink", kv_sink=4,
              kv_recent=16, prefill_chunk=8)
    eng_pp = DecodeEngine(params, config, pp_state=state, **kw)
    out_pp = _drain(eng_pp, [[7, 3, 11], [5, 2]], 40)
    assert all(len(o) == 40 for o in out_pp)
    assert eng_pp._compactions >= 2

    eng_sd = DecodeEngine(params, config, **kw)
    out_sd = _drain(eng_sd, [[7, 3, 11], [5, 2]], 40)
    for a, b in zip(out_pp, out_sd):
        same = np.mean(np.array(a) == np.array(b))
        assert same >= 0.9, (same, a, b)


def test_pp_sink_long_prompt_ingestion_int8(setup):
    """All three compose: pp×tp + int8 KV + sink eviction, with a prompt
    LONGER than max_len (admission compacts the pool slot between prefill
    chunks) — the stream completes with the full token budget."""
    params, config, mesh, state = setup
    rng = np.random.default_rng(0)
    long_prompt = rng.integers(0, 256, 50).tolist()  # > max_len=32
    eng = DecodeEngine(params, config, pp_state=state, kv_dtype="int8",
                       max_slots=2, max_len=32, kv_policy="sink", kv_sink=4,
                       kv_recent=16, prefill_chunk=8)
    out = _drain(eng, [long_prompt], 12)
    assert len(out[0]) == 12
    assert eng._compactions >= 1
    assert eng._host_len[0] <= 32


def test_pp_speculative_greedy_exact_and_accelerates(setup):
    """Speculative decoding composes with pp serving: greedy output is
    BIT-EXACT vs the plain pp engine regardless of draft quality (accept
    while draft == target argmax), and with a perfect draft the pool
    advances gamma+1 tokens per pipelined step."""
    params, config, mesh, state = setup
    prompts = [[7, 3, 11], [5, 2]]
    kw = dict(max_slots=2, max_len=64)

    out_ref = _drain(DecodeEngine(params, config, pp_state=state, **kw),
                     prompts, 16)

    # independent (bad) draft: exactness must still hold
    bad_draft = llama_init_params(jax.random.PRNGKey(7), config)
    eng_bad = DecodeEngine(params, config, pp_state=state,
                           draft_params=bad_draft, draft_config=config,
                           num_speculative_tokens=3, **kw)
    assert _drain(eng_bad, prompts, 16) == out_ref

    # perfect draft (= target): every proposal accepted → few steps
    eng_good = DecodeEngine(params, config, pp_state=state,
                            draft_params=params, draft_config=config,
                            num_speculative_tokens=3, **kw)
    assert _drain(eng_good, prompts, 16) == out_ref
    assert eng_good._steps <= 10, eng_good._steps  # 32 tokens, γ+1=4/step


def test_pp_spec_int8_sink_all_compose(setup):
    """The full matrix: pp×tp + speculative draft + int8 KV + sink
    eviction, generating past max_len — stream completes, cache stays
    bounded, compactions fire on both the staged target cache and the
    single-device draft cache."""
    params, config, mesh, state = setup
    eng = DecodeEngine(params, config, pp_state=state,
                       draft_params=params, draft_config=config,
                       num_speculative_tokens=2, kv_dtype="int8",
                       max_slots=2, max_len=32, kv_policy="sink",
                       kv_sink=4, kv_recent=12, prefill_chunk=8)
    out = _drain(eng, [[7, 3, 11]], 40)
    assert len(out[0]) == 40
    assert eng._compactions >= 1
    assert eng._host_len[0] <= 32


def test_pp_h2o_eviction_matches_single_device(setup):
    """H2O heavy-hitter eviction under pp: the pipelined step surfaces
    per-key attention mass (pp_apply with_mass), the engine accumulates it
    per slot, and eviction keeps heavy+recent rows — greedy output tracks
    the single-device h2o engine."""
    params, config, mesh, state = setup
    kw = dict(max_slots=2, max_len=32, kv_policy="h2o", kv_heavy=8,
              kv_recent=12, prefill_chunk=8)
    eng_pp = DecodeEngine(params, config, pp_state=state, **kw)
    out_pp = _drain(eng_pp, [[7, 3, 11], [5, 2]], 40)
    assert all(len(o) == 40 for o in out_pp)
    assert eng_pp._compactions >= 2
    assert all(l <= 32 for l in eng_pp._host_len[:2])

    eng_sd = DecodeEngine(params, config, **kw)
    out_sd = _drain(eng_sd, [[7, 3, 11], [5, 2]], 40)
    for a, b in zip(out_pp, out_sd):
        same = np.mean(np.array(a) == np.array(b))
        assert same >= 0.9, (same, a, b)


def test_server_yaml_pipeline_parallel(setup):
    """serving_config.pipeline_parallel builds the pp×tp engine from YAML
    (the config-surface path of the library-level pp_state)."""
    import json
    from http.client import HTTPConnection

    from intel_extension_for_transformers_tpu.models.tokenization import (
        ByteTokenizer,
    )
    from intel_extension_for_transformers_tpu.neural_chat.plugins import (
        reset_plugins,
    )
    from intel_extension_for_transformers_tpu.neural_chat.server import (
        NeuralChatServerExecutor,
    )

    # ByteTokenizer emits specials past id 256 — needs the default tiny
    # vocab, not the 256-vocab parity fixture
    config = LlamaConfig.tiny(hidden_size=64, intermediate_size=128)
    params = llama_init_params(jax.random.PRNGKey(0), config)
    mesh = setup[2]
    state = build_pp_serve_state(params, config, mesh)
    reset_plugins()
    executor = NeuralChatServerExecutor()
    ok = executor.init(
        {
            "host": "127.0.0.1",
            "port": 0,
            "model_name_or_path": "tiny-llama-pp",
            "loading_config": {"preloaded": (params, config, ByteTokenizer())},
            "generation_config": {
                "max_new_tokens": 6,
                "do_sample": False,
                "repetition_penalty": 1.0,
            },
            "serving_config": {
                "continuous_batching": True,
                "max_slots": 2,
                "max_len": 64,
                "kv_dtype": "int8",
                "pipeline_parallel": {"pp": 2, "tp": 2},
            },
        }
    )
    assert ok and executor.app.engine is not None
    assert executor.app.engine.pp_state is not None
    assert executor.app.engine.kv_dtype == "int8"
    executor.run(block=False)
    try:
        conn = HTTPConnection("127.0.0.1", executor.port, timeout=300)
        conn.request(
            "POST",
            "/v1/chat/completions",
            json.dumps({
                "model": "tiny-llama-pp",
                "messages": [{"role": "user", "content": "hi"}],
            }),
            {"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        data = json.loads(resp.read())
        conn.close()
        assert resp.status == 200
        assert data["choices"][0]["message"]["content"]
    finally:
        executor.stop()
        reset_plugins()
