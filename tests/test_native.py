"""Native text engine tests: exact parity with the pure-Python splitter and
BM25 (the ref-kernel-comparison strategy of the reference's C++ tests,
SURVEY.md §4: every native kernel validated against a reference impl)."""

import numpy as np
import pytest

from intel_extension_for_transformers_tpu import native
from intel_extension_for_transformers_tpu.retrieval.bm25 import BM25Retriever
from intel_extension_for_transformers_tpu.retrieval.splitter import (
    RecursiveCharacterTextSplitter,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable (no g++?)"
)


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox vaulted a sleepy canine",
    "numpy arrays are stored contiguously in memory",
    "jax traces python functions into XLA programs",
    "the dog sleeps while the fox runs through the field",
    "tokenization splits text into lowercase alphanumeric runs",
]


def _py_splitter(**kw):
    return RecursiveCharacterTextSplitter(use_native=False, **kw)


def _texts():
    para = (
        "TPU systolic arrays execute dense matmuls. "
        "HBM bandwidth bounds most transformer inference.\n\n"
        "Weight-only quantization packs two int4 values per byte. "
        "Group scales keep accuracy near fp32. " * 4
        + "\nShort trailing line."
    )
    return [
        "tiny",
        "word " * 100,
        para,
        ("sentence one. sentence two. " * 20 + "\n\n") * 3,
        "x" * 500,  # no separators at all: char fallback
        "line\n" * 200,
    ]


@pytest.mark.parametrize("chunk_size,overlap", [(64, 0), (128, 16), (50, 10)])
def test_splitter_parity(chunk_size, overlap):
    py = _py_splitter(chunk_size=chunk_size, chunk_overlap=overlap)
    for text in _texts():
        expected = py.split_text(text)
        got = native.split_text(text, chunk_size, overlap)
        assert got == expected, (chunk_size, overlap, text[:40])


def test_splitter_auto_native_equals_python():
    auto = RecursiveCharacterTextSplitter(chunk_size=64, chunk_overlap=8)
    py = _py_splitter(chunk_size=64, chunk_overlap=8)
    for text in _texts():
        assert auto.split_text(text) == py.split_text(text)


def test_splitter_non_ascii_falls_back():
    s = RecursiveCharacterTextSplitter(chunk_size=16, chunk_overlap=0)
    text = "héllo wörld " * 10  # non-ASCII → python path
    chunks = s.split_text(text)
    assert chunks and all(len(c) <= 16 for c in chunks)


def test_bm25_score_parity():
    py = BM25Retriever(prefer_native=False)
    nat = BM25Retriever(prefer_native=True)
    assert nat._native is not None
    docs = [{"content": c, "metadata": {}} for c in CORPUS]
    py.add_documents(docs)
    nat.add_documents(docs)
    for q in ["fox dog", "xla programs", "quick memory", "zebra"]:
        np.testing.assert_allclose(
            nat.score(q), py.score(q), rtol=1e-5, atol=1e-6
        )


def test_bm25_topk_parity():
    py = BM25Retriever(prefer_native=False)
    nat = BM25Retriever(prefer_native=True)
    docs = [{"content": c, "metadata": {"i": i}} for i, c in enumerate(CORPUS)]
    py.add_documents(docs)
    nat.add_documents(docs)
    for q in ["fox", "dog sleeps", "tokenization text"]:
        a = [d["metadata"]["i"] for d in py.get_relevant_documents(q, k=3)]
        b = [d["metadata"]["i"] for d in nat.get_relevant_documents(q, k=3)]
        assert set(a) == set(b), (q, a, b)
        # top hit (strictly highest score) must agree
        assert a[0] == b[0]


def test_bm25_native_scale():
    nat = native.BM25Native()
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(500)]
    for _ in range(2000):
        nat.add(" ".join(rng.choice(words, size=20)))
    ids, scores = nat.query("w1 w2 w3", 10)
    assert len(ids) == 10
    assert np.all(np.diff(scores) <= 1e-6)  # descending
