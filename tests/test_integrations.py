"""LangChain-adapter tests (reference: langchain_community customizations,
P19 — Chroma build/reload, embeddings wrappers, BgeReranker)."""

import numpy as np
import pytest

import jax

from intel_extension_for_transformers_tpu.integrations import (
    BgeReranker,
    Chroma,
    Document,
    HuggingFaceBgeEmbeddings,
    HuggingFaceEmbeddings,
)
from intel_extension_for_transformers_tpu.models.bert import (
    BertConfig,
    bert_init_params,
)
from intel_extension_for_transformers_tpu.models.tokenization import ByteTokenizer
from intel_extension_for_transformers_tpu.retrieval.embedder import TextEmbedder


@pytest.fixture(scope="module")
def embeddings():
    config = BertConfig.tiny(vocab_size=259)
    params = bert_init_params(jax.random.PRNGKey(0), config)
    return HuggingFaceEmbeddings(
        embedder=TextEmbedder(params, config, ByteTokenizer())
    )


TEXTS = [
    "the fox runs through the forest",
    "numpy arrays live in host memory",
    "tpus multiply matrices quickly",
    "the dog sleeps by the fire",
]


def test_chroma_build_search(embeddings):
    store = Chroma.from_texts(TEXTS, embeddings, metadatas=[{"i": i} for i in
                                                            range(4)])
    assert len(store) == 4
    hits = store.similarity_search("the fox runs through the forest", k=2)
    assert isinstance(hits[0], Document)
    # exact self-match must rank first
    assert hits[0].page_content == TEXTS[0]
    # random tiny-encoder embeddings are highly correlated; bf16 index may
    # flip near-ties — self-match must land in top-2 with a high score
    scored = store.similarity_search_with_score(TEXTS[2], k=2)
    assert TEXTS[2] in [d.page_content for d, _ in scored]
    assert scored[0][1] > 0.9


def test_chroma_persist_reload(embeddings, tmp_path):
    d = str(tmp_path / "store")
    store = Chroma.from_documents(
        [Document(t, {"i": i}) for i, t in enumerate(TEXTS)], embeddings,
        persist_directory=d,
    )
    loaded = Chroma.reload(d, embedding=embeddings)
    assert len(loaded) == 4
    a = store.similarity_search(TEXTS[1], k=1)[0].page_content
    b = loaded.similarity_search(TEXTS[1], k=1)[0].page_content
    assert a == b == TEXTS[1]


def test_as_retriever(embeddings):
    store = Chroma.from_texts(TEXTS, embeddings)
    r = store.as_retriever(search_kwargs={"k": 2})
    docs = r.get_relevant_documents(TEXTS[3])
    assert len(docs) == 2
    assert TEXTS[3] in [d.page_content for d in docs]  # bf16 near-tie safe


def test_bge_embeddings_prefix(embeddings):
    bge = HuggingFaceBgeEmbeddings(embedder=embeddings.embedder)
    with_prefix = np.asarray(bge.embed_query("hello"))
    plain = np.asarray(embeddings.embed_query("hello"))
    assert not np.allclose(with_prefix, plain)  # instruction changes the query


def test_bge_reranker():
    class FakeCross:
        def score(self, query, docs):
            return np.asarray([float(query in d) for d in docs])

    rr = BgeReranker(FakeCross(), top_n=2)
    docs = [Document("alpha beta"), Document("gamma"), Document("alpha")]
    out = rr.compress_documents(docs, "alpha")
    assert len(out) == 2
    assert all("alpha" in d.page_content for d in out)
