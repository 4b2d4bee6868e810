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


# ---------------------------------------------------------------- Qdrant
# (reference: langchain_community/vectorstores/qdrant.py:1-290)

def test_qdrant_build_filter_search(embeddings):
    from intel_extension_for_transformers_tpu.integrations import Qdrant

    store = Qdrant.from_texts(
        TEXTS, embeddings,
        metadatas=[{"i": i, "genre": "animal" if i in (0, 3) else "tech",
                    "year": 2020 + i} for i in range(4)],
    )
    assert len(store) == 4
    hits = store.similarity_search(TEXTS[0], k=2)
    assert TEXTS[0] in [d.page_content for d in hits]
    # payload filter: exact match restricts to the animal docs
    only = store.similarity_search(TEXTS[0], k=4, filter={"genre": "animal"})
    assert {d.page_content for d in only} <= {TEXTS[0], TEXTS[3]}
    assert len(only) == 2
    # range + any filters
    rng = store.similarity_search(TEXTS[0], k=4,
                                  filter={"year": {"gte": 2022}})
    assert all(d.metadata["year"] >= 2022 for d in rng)
    anyf = store.similarity_search(TEXTS[0], k=4,
                                   filter={"i": {"any": [1, 2]}})
    assert {d.metadata["i"] for d in anyf} == {1, 2}


def test_qdrant_persist_reload_if_exists(embeddings, tmp_path):
    from intel_extension_for_transformers_tpu.integrations import Qdrant

    d = str(tmp_path / "qdrant")
    store = Qdrant.from_texts(TEXTS[:2], embeddings, persist_directory=d)
    assert len(store) == 2
    # from_documents on an existing collection RELOADS and appends
    # (reference qdrant.py from_documents reload-unless-force_recreate)
    store2 = Qdrant.from_documents(
        [Document(TEXTS[2]), Document(TEXTS[3])], embeddings,
        persist_directory=d,
    )
    assert len(store2) == 4
    # tiny random encoders are highly correlated; bf16 near-ties can flip
    # top-1 — the appended doc must land in top-2 (same guard as Chroma)
    hits = store2.similarity_search(TEXTS[3], k=2)
    assert TEXTS[3] in [d.page_content for d in hits]
    # force_recreate starts fresh
    store3 = Qdrant.from_documents(
        [Document(TEXTS[0])], embeddings, persist_directory=d,
        force_recreate=True,
    )
    assert len(store3) == 1


# ------------------------------------------------------------ instructor
# (reference: embeddings/optimized_instructor_embedding.py:1-227)

def test_instructor_context_masked_pooling():
    from intel_extension_for_transformers_tpu.integrations import (
        InstructorEmbedder,
        InstructorEmbeddings,
    )

    config = BertConfig.tiny(vocab_size=259)
    params = bert_init_params(jax.random.PRNGKey(1), config)
    emb = InstructorEmbedder(params, config, ByteTokenizer(), pooling="mean")
    inst = InstructorEmbeddings(emb)
    docs = inst.embed_documents([TEXTS[0], TEXTS[1]])
    assert np.asarray(docs).shape[1] == config.hidden_size
    # the instruction CONDITIONS the embedding (attention sees it) ...
    a = np.asarray(emb.encode_with_instruction([TEXTS[0]], "Represent: "))
    b = np.asarray(emb.encode_with_instruction([TEXTS[0]],
                                               "Summarize for search: "))
    assert not np.allclose(a, b)
    # ... but pooling EXCLUDES it: embedding differs from plain-mean over
    # the full instruction+text sequence
    joint = emb.encode(["Represent: " + TEXTS[0]])
    assert not np.allclose(a, np.asarray(joint))
    # query vs document instructions differ
    q = np.asarray(inst.embed_query(TEXTS[0]))
    d0 = np.asarray(docs[0])
    assert not np.allclose(q, d0)


def test_import_shims():
    """haystack / llama_index named import surfaces (reference:
    haystack/__init__.py:1, llama_index/__init__.py:1)."""
    from intel_extension_for_transformers_tpu.haystack import (
        DocumentStore, Embedder, Ranker)
    from intel_extension_for_transformers_tpu.llama_index import (
        HuggingFaceEmbedding, QdrantVectorStore, SentenceTransformerRerank)

    assert DocumentStore is QdrantVectorStore
    assert Embedder is HuggingFaceEmbedding
    assert Ranker is SentenceTransformerRerank
