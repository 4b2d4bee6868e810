"""Qdrant-shaped vectorstore over the on-HBM FlatIndex.

Re-creation of the reference's second langchain vectorstore
(reference: transformers/langchain/langchain_community/vectorstores/
qdrant.py:1-290 — a `Qdrant` subclass adding `from_documents` with
`persist_directory` semantics and reload-if-exists, plus the qdrant
payload-filter search surface). There is no qdrant server here: the
"collection" is a FlatIndex + a payload list, `location=":memory:"` or a
`persist_directory` replaces the client URL, and payload filtering runs
host-side over an oversampled candidate set from the device scan.

Filter syntax (the useful subset of qdrant's):
    {"genre": "news"}                     — exact match
    {"year": {"gte": 2020, "lte": 2024}}  — range (gt/gte/lt/lte)
    {"tag": {"any": ["a", "b"]}}          — match-any
Keys combine with AND, like a qdrant `Filter(must=[...])`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from intel_extension_for_transformers_tpu.integrations.langchain import (
    Document,
)
from intel_extension_for_transformers_tpu.retrieval.index import FlatIndex

__all__ = ["Qdrant"]


def _payload_matches(payload: Dict[str, Any], flt: Optional[dict]) -> bool:
    if not flt:
        return True
    for key, cond in flt.items():
        val = payload.get(key)
        if isinstance(cond, dict):
            if "any" in cond and val not in cond["any"]:
                return False
            if "gt" in cond and not (val is not None and val > cond["gt"]):
                return False
            if "gte" in cond and not (val is not None and val >= cond["gte"]):
                return False
            if "lt" in cond and not (val is not None and val < cond["lt"]):
                return False
            if "lte" in cond and not (val is not None and val <= cond["lte"]):
                return False
        elif val != cond:
            return False
    return True


class Qdrant:
    """Qdrant-API vectorstore backed by FlatIndex (see module docstring)."""

    _LANGCHAIN_DEFAULT_COLLECTION_NAME = "langchain"

    def __init__(
        self,
        embedding_function=None,
        collection_name: str = _LANGCHAIN_DEFAULT_COLLECTION_NAME,
        location: Optional[str] = ":memory:",
        persist_directory: Optional[str] = None,
        index: Optional[FlatIndex] = None,
        index_dtype: str = "bfloat16",
    ):
        self.embedding_function = embedding_function
        self.collection_name = collection_name
        self.persist_directory = (
            persist_directory
            if persist_directory
            else (None if location in (None, ":memory:") else location)
        )
        self._index = index
        self._index_dtype = index_dtype
        self._docs: List[Document] = []

    # ------------------------------------------------------------- build
    @classmethod
    def from_documents(
        cls,
        documents: Sequence,
        embedding,
        persist_directory: Optional[str] = None,
        collection_name: str = _LANGCHAIN_DEFAULT_COLLECTION_NAME,
        force_recreate: bool = False,
        **kw,
    ) -> "Qdrant":
        """Reload-if-exists like the reference (qdrant.py from_documents:
        an existing collection at persist_directory is reused unless
        force_recreate)."""
        if (
            persist_directory
            and not force_recreate
            and os.path.exists(
                os.path.join(persist_directory, collection_name, "docs.json")
            )
        ):
            store = cls.reload(persist_directory, embedding,
                               collection_name=collection_name)
            store.add_documents(documents)
            store.persist()
            return store
        store = cls(
            embedding_function=embedding,
            collection_name=collection_name,
            persist_directory=persist_directory,
            **kw,
        )
        store.add_documents(documents)
        if persist_directory:
            store.persist()
        return store

    @classmethod
    def from_texts(
        cls, texts: Sequence[str], embedding, metadatas=None, **kw
    ) -> "Qdrant":
        metadatas = metadatas or [{} for _ in texts]
        docs = [Document(t, dict(m)) for t, m in zip(texts, metadatas)]
        return cls.from_documents(docs, embedding, **kw)

    # ------------------------------------------------------- persistence
    def _coll_dir(self, root: Optional[str] = None) -> str:
        return os.path.join(root or self.persist_directory,
                            self.collection_name)

    def persist(self) -> None:
        assert self.persist_directory, "no persist_directory configured"
        d = self._coll_dir()
        os.makedirs(d, exist_ok=True)
        self._index.save(os.path.join(d, "index"))
        with open(os.path.join(d, "docs.json"), "w") as f:
            json.dump(
                [
                    {"page_content": x.page_content, "metadata": x.metadata}
                    for x in self._docs
                ],
                f,
            )

    @classmethod
    def reload(
        cls,
        persist_directory: str,
        embedding=None,
        collection_name: str = _LANGCHAIN_DEFAULT_COLLECTION_NAME,
    ) -> "Qdrant":
        store = cls(
            embedding_function=embedding,
            collection_name=collection_name,
            persist_directory=persist_directory,
        )
        d = store._coll_dir(persist_directory)
        store._index = FlatIndex.load(os.path.join(d, "index"))
        with open(os.path.join(d, "docs.json")) as f:
            store._docs = [Document(**x) for x in json.load(f)]
        return store

    # -------------------------------------------------------------- add
    def add_documents(self, documents: Sequence) -> List[int]:
        docs = []
        for d in documents:
            if isinstance(d, Document):
                docs.append(d)
            elif isinstance(d, dict):
                docs.append(
                    Document(d.get("page_content", d.get("content", "")),
                             dict(d.get("metadata", {})))
                )
            else:
                docs.append(Document(d.page_content, dict(d.metadata)))
        if not docs:
            return []
        vecs = np.asarray(
            self.embedding_function.embed_documents(
                [d.page_content for d in docs]
            ),
            np.float32,
        )
        if self._index is None:
            self._index = FlatIndex(dim=vecs.shape[1],
                                    dtype=self._index_dtype)
        ids = self._index.add(vecs)
        self._docs.extend(docs)
        return list(ids)

    def add_texts(self, texts: Iterable[str], metadatas=None) -> List[int]:
        texts = list(texts)
        metadatas = metadatas or [{} for _ in texts]
        return self.add_documents(
            [Document(t, dict(m)) for t, m in zip(texts, metadatas)]
        )

    # ------------------------------------------------------------ search
    def similarity_search_with_score(
        self, query: str, k: int = 4, filter: Optional[dict] = None
    ) -> List[Tuple[Document, float]]:
        """Payload-filtered search: the device scan oversamples (4k, or
        everything when the collection is small/highly filtered) and the
        filter applies host-side over payloads — the bounded-candidate
        analogue of qdrant's filtered HNSW."""
        q = np.asarray(self.embedding_function.embed_query(query), np.float32)
        n = len(self._docs)
        fetch = n if filter else min(max(4 * k, k), n)
        scores, ids = self._index.search(q[None, :], k=fetch)
        out: List[Tuple[Document, float]] = []
        for s, i in zip(np.asarray(scores)[0], np.asarray(ids)[0]):
            i = int(i)
            if not 0 <= i < n:
                continue
            doc = self._docs[i]
            if _payload_matches(doc.metadata, filter):
                out.append((doc, float(s)))
            if len(out) >= k:
                break
        return out

    def similarity_search(
        self, query: str, k: int = 4, filter: Optional[dict] = None
    ) -> List[Document]:
        return [d for d, _ in
                self.similarity_search_with_score(query, k, filter)]

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
