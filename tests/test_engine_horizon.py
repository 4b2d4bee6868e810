"""Fused decode horizon: K pool decode steps per dispatch (one lax.scan
program), amortizing per-dispatch host/relay overhead.

The reference's serving throughput story is vLLM adoption
(reference: transformers/modeling/modeling_auto.py:364-533); vLLM later grew
multi-step scheduling for exactly this host-overhead reason — here it is
native to the XLA engine. Correctness bar: per-request output is EXACTLY
the horizon=1 output (which itself equals single-request decode)."""

import numpy as np
import pytest

import jax

from intel_extension_for_transformers_tpu.models.engine import (
    DecodeEngine,
    EngineRequest,
)
from intel_extension_for_transformers_tpu.models.generation import (
    SamplingConfig,
    generate,
)
from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_init_params,
)


@pytest.fixture(scope="module")
def tiny():
    config = LlamaConfig.tiny(vocab_size=256, hidden_size=64,
                              intermediate_size=128)
    params = llama_init_params(jax.random.PRNGKey(0), config)
    return params, config


def test_horizon_greedy_parity_and_fewer_dispatches(tiny):
    params, config = tiny
    eng = DecodeEngine(params, config, max_slots=4, max_len=128,
                       decode_horizon=4).start()
    try:
        steps0 = eng._steps
        reqs = [
            eng.submit(EngineRequest(
                np.array([i + 1, i + 2, i + 3], np.int32), max_new_tokens=13))
            for i in range(4)
        ]
        outs = [list(r.tokens()) for r in reqs]
        for i, out in enumerate(outs):
            ref = generate(
                params, config, np.array([i + 1, i + 2, i + 3], np.int32),
                SamplingConfig(max_new_tokens=13),
            )[0]
            np.testing.assert_array_equal(ref, np.array(out))
        # 12 post-prefill tokens at horizon 4 → ~3 decode dispatches (+
        # admission interleave) instead of 12
        assert eng._steps - steps0 <= 7
        assert eng.stats()["decode_horizon"] == 4
    finally:
        eng.stop()


def test_horizon_eos_mid_burst(tiny):
    """EOS landing inside a burst truncates exactly like horizon=1."""
    params, config = tiny
    prompt = np.array([5, 17, 99, 3], np.int32)
    full = generate(params, config, prompt,
                    SamplingConfig(max_new_tokens=12))[0]
    eos = int(full[6])  # stops mid-second-burst at horizon 4
    eng = DecodeEngine(params, config, max_slots=2, max_len=128,
                       decode_horizon=4).start()
    try:
        out = eng.generate(prompt, max_new_tokens=12, eos_token_id=eos)
        np.testing.assert_array_equal(full[:6], np.array(out))
        assert eng.active_slots == 0
    finally:
        eng.stop()


def test_horizon_with_kv_eviction(tiny):
    """Unbounded generation through a bounded cache still works when each
    dispatch consumes `horizon` cache rows: the compaction headroom check
    accounts for the burst width."""
    params, config = tiny
    eng = DecodeEngine(params, config, max_slots=2, max_len=64,
                       decode_horizon=4, kv_policy="sink", kv_sink=4,
                       kv_recent=24).start()
    try:
        out = eng.generate(np.arange(1, 9, dtype=np.int32),
                           max_new_tokens=120)
        assert len(out) == 120
        assert eng._compactions >= 2
    finally:
        eng.stop()


def test_horizon_guided_choice(tiny):
    """Guided decoding composes: the device GuideState advances inside the
    scan; the host completes the slot on the shortest full match."""
    params, config = tiny
    eng = DecodeEngine(params, config, max_slots=2, max_len=128,
                       decode_horizon=4).start()
    try:
        seqs = [[11, 22, 33], [44, 55]]
        req = eng.submit(EngineRequest(
            np.array([1, 2, 3], np.int32), max_new_tokens=32,
            guided_token_seqs=seqs,
        ))
        out = list(req.tokens())
        assert out in (seqs[0], seqs[1])
    finally:
        eng.stop()


def test_horizon_pp_greedy_parity(tiny):
    """The pipelined pool decodes `horizon` steps per dispatch with exact
    greedy parity (pp×tp on the 8-device CPU mesh)."""
    from intel_extension_for_transformers_tpu.parallel import create_mesh
    from intel_extension_for_transformers_tpu.parallel.pp_serve import (
        build_pp_serve_state,
    )

    params, config = tiny
    mesh = create_mesh(dp=-1, pp=2, tp=2)
    state = build_pp_serve_state(params, config, mesh)
    eng = DecodeEngine(params, config, max_slots=2, max_len=64,
                       pp_state=state, decode_horizon=4).start()
    try:
        steps0 = eng._steps
        prompt = np.array([7, 3, 11], np.int32)
        ref = generate(params, config, prompt,
                       SamplingConfig(max_new_tokens=9))[0]
        out = eng.generate(prompt, max_new_tokens=9)
        np.testing.assert_array_equal(ref, np.array(out))
        assert eng._steps - steps0 <= 3
    finally:
        eng.stop()


def test_horizon_ignored_with_speculation(tiny):
    """Speculative decoding already emits up to gamma+1 tokens per dispatch;
    a requested horizon is clamped to 1 rather than compounding."""
    params, config = tiny
    eng = DecodeEngine(params, config, max_slots=2, max_len=128,
                       draft_params=params, draft_config=config,
                       num_speculative_tokens=3, decode_horizon=4)
    assert eng.decode_horizon == 1
