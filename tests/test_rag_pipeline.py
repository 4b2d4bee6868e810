"""End-to-end RAG pipeline tests with a tiny encoder.

Models the reference RAG accuracy test (reference:
neural_chat/tests/ci/api/test_rag.py:37-49 — build an index over sample docs
with a real model, then answer queries).
"""

import numpy as np
import pytest

import jax

from intel_extension_for_transformers_tpu.models.bert import (
    BertConfig,
    bert_init_params,
)
from intel_extension_for_transformers_tpu.retrieval import (
    CrossEncoderReranker,
    RetrievalAgent,
    TextEmbedder,
)


@pytest.fixture(scope="module")
def embedder():
    config = BertConfig.tiny()
    params = bert_init_params(jax.random.PRNGKey(0), config)
    return TextEmbedder(params, config, batch_size=8, max_length=64, buckets=(32, 64))


@pytest.fixture()
def corpus_dir(tmp_path):
    (tmp_path / "tpu.txt").write_text(
        "TPUs are tensor processing units designed by Google for machine "
        "learning workloads. The MXU systolic array performs matrix "
        "multiplications in bfloat16 precision."
    )
    (tmp_path / "quant.txt").write_text(
        "Weight-only quantization stores model weights in int4 precision "
        "with group-wise scales, reducing memory footprint by four times."
    )
    (tmp_path / "cooking.txt").write_text(
        "To bake sourdough bread you need flour, water, salt and a sourdough "
        "starter. Proof the dough overnight in the refrigerator."
    )
    return str(tmp_path)


def test_agent_build_and_retrieve(embedder, corpus_dir):
    agent = RetrievalAgent(embedder, corpus_dir, top_k=2, index_dtype="float32")
    assert agent.index is not None and len(agent.index) >= 3
    hits = agent.get_context("what is weight only quantization")
    assert len(hits) == 2
    assert all("score" in h["metadata"] for h in hits)


def test_agent_prompt_assembly(embedder, corpus_dir):
    agent = RetrievalAgent(embedder, corpus_dir, top_k=1, index_dtype="float32")
    prompt = agent.pre_llm_inference_actions("how do TPUs multiply matrices?")
    assert "### Question: how do TPUs multiply matrices?" in prompt
    assert "### Context:" in prompt


def test_agent_no_docs_prompt(embedder):
    agent = RetrievalAgent(embedder)
    prompt = agent.pre_llm_inference_actions("hello")
    assert "### Question: hello" in prompt
    assert "Context" not in prompt


def test_agent_persistence(embedder, corpus_dir, tmp_path):
    persist = str(tmp_path / "kb")
    agent = RetrievalAgent(
        embedder, corpus_dir, persist_directory=persist, index_dtype="float32"
    )
    n = len(agent.index)
    agent2 = RetrievalAgent(embedder, persist_directory=persist, index_dtype="float32")
    assert len(agent2.index) == n
    assert agent2.get_context("sourdough bread")  # docs.json reloaded


def test_agent_bm25(embedder, corpus_dir):
    agent = RetrievalAgent(embedder, corpus_dir, retrieval_type="bm25", top_k=2)
    hits = agent.get_context("sourdough starter flour")
    assert hits and "sourdough" in hits[0]["content"]


def test_agent_child_parent(embedder, corpus_dir):
    agent = RetrievalAgent(
        embedder, corpus_dir, retrieval_type="child_parent", top_k=2
    )
    hits = agent.get_context("int4 group scales memory")
    assert hits


def test_agent_invalid_type(embedder):
    with pytest.raises(ValueError):
        RetrievalAgent(embedder, retrieval_type="bogus")


def test_reranker_orders_and_annotates(embedder):
    config = embedder.config
    params = bert_init_params(jax.random.PRNGKey(1), config)
    rng = np.random.default_rng(0)
    params["classifier"] = {
        "kernel": rng.normal(size=(config.hidden_size, 1)).astype(np.float32),
        "bias": np.zeros((1,), np.float32),
    }
    rr = CrossEncoderReranker(params, config, max_length=64)
    docs = [{"content": f"document number {i}", "metadata": {}} for i in range(5)]
    out = rr.rerank("some query", docs, top_n=3)
    assert len(out) == 3
    scores = [d["metadata"]["relevance_score"] for d in out]
    assert scores == sorted(scores, reverse=True)


def test_embedder_bucketing_consistency(embedder):
    # same text must embed identically whether batched with short or long texts
    texts_a = ["short text", "x " * 200]
    texts_b = ["short text"]
    ea = embedder.encode(texts_a)
    eb = embedder.encode(texts_b)
    np.testing.assert_allclose(ea[0], eb[0], rtol=1e-4, atol=1e-5)


def test_embedder_query_instruction():
    config = BertConfig.tiny()
    params = bert_init_params(jax.random.PRNGKey(2), config)
    emb = TextEmbedder(
        params, config, query_instruction="Represent this sentence: ", max_length=64
    )
    q = emb.encode(["hello"], is_query=True)
    d = emb.encode(["hello"])
    # instruction prefix must change the query embedding
    assert not np.allclose(q, d)
