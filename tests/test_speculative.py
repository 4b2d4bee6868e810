"""Speculative decoding tests: greedy output must EXACTLY match target-only
greedy decoding (the core correctness guarantee), acceptance accounting,
EOS handling (reference behavior: assisted generation,
model_utils.py:503-516)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.generation import (
    SamplingConfig,
    generate,
)
from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_init_params,
)
from intel_extension_for_transformers_tpu.models.speculative import (
    generate_speculative,
)

T_CFG = LlamaConfig.tiny(vocab_size=64, max_position_embeddings=128)
D_CFG = LlamaConfig.tiny(
    vocab_size=64,
    hidden_size=64,
    num_hidden_layers=1,
    num_attention_heads=2,
    num_key_value_heads=1,
    intermediate_size=128,
    max_position_embeddings=128,
)

GREEDY = SamplingConfig(
    max_new_tokens=24, do_sample=False, temperature=0.0, repetition_penalty=1.0
)


@pytest.fixture(scope="module")
def target():
    return llama_init_params(jax.random.PRNGKey(0), T_CFG)


@pytest.fixture(scope="module")
def draft():
    return llama_init_params(jax.random.PRNGKey(1), D_CFG)


def test_greedy_matches_target_only(target, draft):
    """With an arbitrary (even bad) draft, greedy speculative output equals
    plain greedy decoding of the target exactly."""
    prompt = np.arange(8, dtype=np.int32) % 64
    ref = generate(target, T_CFG, prompt, GREEDY)
    stats = {}
    got = generate_speculative(
        target, T_CFG, draft, D_CFG, prompt, GREEDY, spec_k=4, stats=stats
    )
    np.testing.assert_array_equal(ref[0], got[0][: ref.shape[1]])
    assert stats["rounds"] > 0


def test_self_draft_accepts_everything(target):
    """Draft == target → every proposal accepted (rate 1.0), and output
    still exact."""
    prompt = np.arange(6, dtype=np.int32) % 64
    stats = {}
    got = generate_speculative(
        target, T_CFG, target, T_CFG, prompt, GREEDY, spec_k=4, stats=stats
    )
    ref = generate(target, T_CFG, prompt, GREEDY)
    np.testing.assert_array_equal(ref[0], got[0][: ref.shape[1]])
    assert stats["acceptance_rate"] == 1.0


def test_sampled_speculative_runs(target, draft):
    cfg = SamplingConfig(max_new_tokens=16, do_sample=True, temperature=0.8)
    out = generate_speculative(
        target, T_CFG, draft, D_CFG, np.arange(5, dtype=np.int32), cfg, spec_k=3
    )
    assert out.shape[0] == 1 and 1 <= out.shape[1] <= 16
    assert np.all(out >= 0) and np.all(out < 64)


def test_eos_stops_stream(target, draft):
    # force EOS = the greedy first token so generation stops immediately
    ref = generate(target, T_CFG, np.arange(8, dtype=np.int32) % 64, GREEDY)
    eos = int(ref[0, 0])
    cfg = SamplingConfig(
        max_new_tokens=24,
        do_sample=False,
        temperature=0.0,
        repetition_penalty=1.0,
        eos_token_id=eos,
    )
    out = generate_speculative(
        target, T_CFG, draft, D_CFG, np.arange(8, dtype=np.int32) % 64, cfg
    )
    assert out.shape[1] == 1 and int(out[0, -1]) == eos
