"""LangChain-compatible adapters over the TPU retrieval engine.

Re-creation of the reference's langchain_community customizations
(reference: transformers/langchain/langchain_community/ — `Chroma` subclass
with build/reload vectorstores/chroma.py:50-238, `HuggingFaceEmbeddings` /
`HuggingFaceBgeEmbeddings` embeddings.py:42-213, `BgeReranker`
retrievers/bge_reranker.py:28-75). Same method surface, but the store is the
on-HBM FlatIndex and the embedder is the batched TPU encoder — a langchain
user can swap imports and keep their pipeline code.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from intel_extension_for_transformers_tpu.retrieval.embedder import TextEmbedder
from intel_extension_for_transformers_tpu.retrieval.index import FlatIndex


@dataclass
class Document:
    """langchain.schema.Document shape."""

    page_content: str
    metadata: Dict[str, Any] = field(default_factory=dict)


class HuggingFaceEmbeddings:
    """embed_documents/embed_query over the TPU encoder
    (reference: embeddings.py:42)."""

    def __init__(self, model_name: str = "BAAI/bge-small-en-v1.5",
                 embedder: Optional[TextEmbedder] = None, **kw):
        self.embedder = embedder or TextEmbedder.from_pretrained(model_name, **kw)

    def embed_documents(self, texts: List[str]) -> List[List[float]]:
        return self.embedder.embed_documents(texts)

    def embed_query(self, text: str) -> List[float]:
        return self.embedder.embed_query(text)


class HuggingFaceBgeEmbeddings(HuggingFaceEmbeddings):
    """Adds the BGE query-instruction prefix (reference: embeddings.py:130,
    query_instruction 'Represent this sentence for searching relevant
    passages:')."""

    DEFAULT_QUERY_INSTRUCTION = (
        "Represent this sentence for searching relevant passages: "
    )

    def __init__(self, *args, query_instruction: Optional[str] = None, **kw):
        super().__init__(*args, **kw)
        self.query_instruction = (
            self.DEFAULT_QUERY_INSTRUCTION
            if query_instruction is None
            else query_instruction
        )

    def embed_query(self, text: str) -> List[float]:
        return self.embedder.embed_query(self.query_instruction + text)


class Chroma:
    """Vectorstore with the reference's extended API: `from_documents`,
    `build`, `reload`, `similarity_search`, `as_retriever`
    (reference: vectorstores/chroma.py:50-238) — backed by the on-HBM
    FlatIndex instead of a chromadb server."""

    def __init__(self, embedding_function=None, persist_directory=None,
                 index: Optional[FlatIndex] = None, **kw):
        self.embedding_function = embedding_function
        self.persist_directory = persist_directory
        self._index = index
        self._docs: List[Document] = []

    # ------------------------------------------------------------- build
    @classmethod
    def from_documents(cls, documents: Sequence, embedding,
                       persist_directory: Optional[str] = None, **kw) -> "Chroma":
        store = cls(embedding_function=embedding,
                    persist_directory=persist_directory)
        store.add_documents(documents)
        if persist_directory:
            store.persist()
        return store

    # reference alias (chroma.py `build` classmethod)
    build = from_documents

    @classmethod
    def from_texts(cls, texts: Sequence[str], embedding, metadatas=None,
                   **kw) -> "Chroma":
        metadatas = metadatas or [{} for _ in texts]
        docs = [Document(t, dict(m)) for t, m in zip(texts, metadatas)]
        return cls.from_documents(docs, embedding, **kw)

    @classmethod
    def reload(cls, persist_directory: str, embedding=None, **kw) -> "Chroma":
        """(reference: chroma.py reload / reload_localdb)"""
        store = cls(embedding_function=embedding,
                    persist_directory=persist_directory)
        store._index = FlatIndex.load(os.path.join(persist_directory, "index"))
        import json

        with open(os.path.join(persist_directory, "docs.json")) as f:
            store._docs = [Document(**d) for d in json.load(f)]
        return store

    def persist(self) -> None:
        assert self.persist_directory, "no persist_directory configured"
        os.makedirs(self.persist_directory, exist_ok=True)
        self._index.save(os.path.join(self.persist_directory, "index"))
        import json

        with open(os.path.join(self.persist_directory, "docs.json"), "w") as f:
            json.dump(
                [{"page_content": d.page_content, "metadata": d.metadata}
                 for d in self._docs],
                f,
            )

    # -------------------------------------------------------------- add
    def _as_documents(self, documents: Sequence) -> List[Document]:
        out = []
        for d in documents:
            if isinstance(d, Document):
                out.append(d)
            elif isinstance(d, dict):
                out.append(
                    Document(d.get("content", d.get("page_content", "")),
                             dict(d.get("metadata", {})))
                )
            else:  # langchain Document duck-type
                out.append(Document(d.page_content, dict(d.metadata)))
        return out

    def add_documents(self, documents: Sequence) -> List[int]:
        docs = self._as_documents(documents)
        vecs = np.asarray(
            self.embedding_function.embed_documents(
                [d.page_content for d in docs]
            ),
            np.float32,
        )
        if self._index is None:
            self._index = FlatIndex(dim=vecs.shape[1], dtype="bfloat16")
        ids = self._index.add(vecs)
        self._docs.extend(docs)
        return list(ids)

    def add_texts(self, texts: Iterable[str], metadatas=None) -> List[int]:
        metadatas = metadatas or [{} for _ in texts]
        return self.add_documents(
            [Document(t, dict(m)) for t, m in zip(texts, metadatas)]
        )

    # ------------------------------------------------------------ search
    def similarity_search_with_score(
        self, query: str, k: int = 4
    ) -> List[Tuple[Document, float]]:
        q = np.asarray(self.embedding_function.embed_query(query), np.float32)
        scores, ids = self._index.search(q[None, :], k=min(k, len(self._docs)))
        return [
            (self._docs[int(i)], float(s))
            for s, i in zip(np.asarray(scores)[0], np.asarray(ids)[0])
            if 0 <= int(i) < len(self._docs)
        ]

    def similarity_search(self, query: str, k: int = 4) -> List[Document]:
        return [d for d, _ in self.similarity_search_with_score(query, k)]

    def as_retriever(self, search_kwargs: Optional[dict] = None):
        kw = search_kwargs or {}

        class _Retriever:
            def __init__(self, store):
                self.store = store

            def get_relevant_documents(self, query: str) -> List[Document]:
                return self.store.similarity_search(query, **kw)

            invoke = get_relevant_documents

        return _Retriever(self)

    def __len__(self) -> int:
        return len(self._docs)


class BgeReranker:
    """Cross-encoder document compressor (reference: bge_reranker.py:28 —
    FlagReranker scores → keep top_n)."""

    def __init__(self, reranker, top_n: int = 3):
        self.reranker = reranker  # retrieval.reranker.CrossEncoderReranker
        self.top_n = top_n

    def bge_rerank(self, query: str, docs: List[str]) -> List[Tuple[int, float]]:
        scores = self.reranker.score(query, docs)
        order = np.argsort(-np.asarray(scores))[: self.top_n]
        return [(int(i), float(scores[i])) for i in order]

    def compress_documents(self, documents: Sequence, query: str) -> List:
        docs = list(documents)
        texts = [
            d.page_content if hasattr(d, "page_content") else d["content"]
            for d in docs
        ]
        return [docs[i] for i, _ in self.bge_rerank(query, texts)]
