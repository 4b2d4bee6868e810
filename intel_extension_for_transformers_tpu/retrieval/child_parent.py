"""Child-parent retriever: search fine chunks, return their parent contexts.

Parity with the reference's ChildParentRetriever
(reference: langchain_community/retrievers/child_parent_retriever.py:36 and
retrieval type "child_parent" in retrieval_agent.py:92-208): documents are
chunked twice — small "child" chunks give sharp embedding matches, and each
hit is mapped back to its larger "parent" chunk for LLM context.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from intel_extension_for_transformers_tpu.retrieval.index import FlatIndex
from intel_extension_for_transformers_tpu.retrieval.splitter import (
    RecursiveCharacterTextSplitter,
)


class ChildParentRetriever:
    def __init__(
        self,
        embedder,
        *,
        child_chunk_size: int = 256,
        parent_chunk_size: int = 1024,
        index_dtype: str = "bfloat16",
        top_k: int = 4,
    ):
        self.embedder = embedder
        self.child_splitter = RecursiveCharacterTextSplitter(
            chunk_size=child_chunk_size, chunk_overlap=child_chunk_size // 16
        )
        self.parent_splitter = RecursiveCharacterTextSplitter(
            chunk_size=parent_chunk_size, chunk_overlap=parent_chunk_size // 16
        )
        self.top_k = top_k
        self.index: Optional[FlatIndex] = None
        self._index_dtype = index_dtype
        self.parents: List[dict] = []
        self._child_to_parent: List[int] = []

    def add_documents(self, docs: List[dict]) -> None:
        parents = self.parent_splitter.split_documents(docs)
        child_texts: List[str] = []
        for pi, parent in enumerate(parents, start=len(self.parents)):
            for child in self.child_splitter.split_text(parent["content"]):
                child_texts.append(child)
                self._child_to_parent.append(pi)
        self.parents.extend(parents)
        if not child_texts:
            return
        vecs = self.embedder.encode(child_texts)
        if self.index is None:
            self.index = FlatIndex(
                dim=vecs.shape[1], dtype=self._index_dtype, metric="ip"
            )
        self.index.add(vecs)

    def get_relevant_documents(self, query: str, k: Optional[int] = None) -> List[dict]:
        if self.index is None or len(self.index) == 0:
            return []
        k = k or self.top_k
        qv = self.embedder.encode([query], is_query=True)
        # over-fetch children: distinct parents may collapse
        _, child_ids = self.index.search(qv, k=min(4 * k, len(self.index)))
        seen, out = set(), []
        for cid in child_ids[0]:
            pid = self._child_to_parent[int(cid)]
            if pid not in seen:
                seen.add(pid)
                out.append(self.parents[pid])
            if len(out) >= k:
                break
        return out
