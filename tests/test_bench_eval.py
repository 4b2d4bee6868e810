"""Benchmark API, profiling, and evaluation-harness tests."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_init_params,
)
from intel_extension_for_transformers_tpu.models.bert import (
    BertConfig,
    bert_init_params,
)
from intel_extension_for_transformers_tpu.evaluation import (
    evaluate_multiple_choice,
    evaluate_perplexity,
    loglikelihood,
)
from intel_extension_for_transformers_tpu.utils.benchmark import (
    BenchmarkConfig,
    benchmark_callable,
    benchmark_encoder,
    benchmark_fused,
    benchmark_generation,
)
from intel_extension_for_transformers_tpu.utils.profiling import StageTimer

CFG = LlamaConfig.tiny(vocab_size=64, max_position_embeddings=128)


@pytest.fixture(scope="module")
def params():
    return llama_init_params(jax.random.PRNGKey(0), CFG)


def test_benchmark_callable():
    r = benchmark_callable(lambda: sum(range(1000)), warmup=1, iteration=5)
    assert r.latency_ms > 0 and r.throughput > 0
    assert "latency" in r.summary()


def test_benchmark_fused():
    def step(i, x):
        return x @ x

    x = jnp.eye(64, dtype=jnp.float32)
    r = benchmark_fused(step, x, iters=20, items_per_iter=64)
    assert r.latency_ms > 0


def test_benchmark_generation(params):
    res = benchmark_generation(
        params, CFG, BenchmarkConfig(batch_size=2, seq_len=16, iteration=3,
                                     warmup=1, generate_tokens=8)
    )
    assert res["prefill"].throughput > 0
    assert res["decode"].throughput > 0
    assert res["decode"].unit == "decode tokens/s"


def test_benchmark_encoder():
    bcfg = BertConfig.tiny()
    bparams = bert_init_params(jax.random.PRNGKey(0), bcfg)
    r = benchmark_encoder(
        bparams, bcfg, BenchmarkConfig(batch_size=2, seq_len=16, iteration=3,
                                       warmup=1)
    )
    assert r.unit == "sentences/s" and r.throughput > 0


def test_stage_timer(tmp_path):
    t = StageTimer(verbose=False)
    with t.stage("encode", batch=4):
        pass
    with t.stage("search"):
        pass
    with t.stage("encode"):
        pass
    totals = t.totals()
    assert set(totals) == {"encode", "search"}
    p = str(tmp_path / "prof.jsonl")
    t.write_jsonl(p)
    lines = [json.loads(l) for l in open(p)]
    assert len(lines) == 3 and lines[0]["name"] == "encode"
    t.write_csv(str(tmp_path / "prof.csv"))
    assert os.path.exists(tmp_path / "prof.csv")


# ------------------------------------------------------------- evaluation


def test_loglikelihood_shapes(params):
    reqs = [([1, 2, 3], [4, 5]), ([7], [8, 9, 10]), ([1], [2])]
    out = loglikelihood(params, CFG, reqs, batch_size=2)
    assert len(out) == 3
    for ll, greedy in out:
        assert ll < 0 and isinstance(greedy, bool)


def test_loglikelihood_padding_invariance(params):
    """The same request must score identically alone vs batched with a
    longer one (padding must not leak into the score)."""
    r = ([3, 4, 5], [6, 7])
    alone = loglikelihood(params, CFG, [r])[0][0]
    batched = loglikelihood(params, CFG, [r, ([1] * 10, [2] * 10)])[0][0]
    assert abs(alone - batched) < 1e-3


def test_multiple_choice(params):
    rng = np.random.default_rng(0)
    qs = []
    for _ in range(6):
        qs.append(
            {
                "context": list(rng.integers(1, 64, size=5)),
                "choices": [list(rng.integers(1, 64, size=3)) for _ in range(4)],
                "gold": int(rng.integers(0, 4)),
            }
        )
    res = evaluate_multiple_choice(params, CFG, qs, batch_size=8)
    assert res["n"] == 6 and 0.0 <= res["accuracy"] <= 1.0


def test_perplexity(params):
    ids = list(np.random.default_rng(0).integers(1, 64, size=200))
    res = evaluate_perplexity(params, CFG, ids, window=64, stride=64)
    assert res["perplexity"] > 1.0
    assert res["tokens"] > 100
    # an untrained tiny model ~ uniform: ppl near vocab size
    assert res["perplexity"] < 200
