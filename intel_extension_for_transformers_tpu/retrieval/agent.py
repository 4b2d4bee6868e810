"""RetrievalAgent — the RAG pipeline plugin (Agent_QA equivalent).

Re-creation of the reference's retrieval plugin
(reference: neural_chat/pipeline/plugins/retrieval/retrieval_agent.py:59-310):
document parsing → chunking → embedding → index build; at query time
retrieve → (optional rerank) → QA prompt assembly, exposed through the
plugin hook `pre_llm_inference_actions`. Retrieval types: "default" (dense
flat index), "child_parent", "bm25" (:92-96). KB management: append/create/
reload (:211-291).
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

from intel_extension_for_transformers_tpu.retrieval.bm25 import BM25Retriever
from intel_extension_for_transformers_tpu.retrieval.child_parent import (
    ChildParentRetriever,
)
from intel_extension_for_transformers_tpu.retrieval.index import FlatIndex
from intel_extension_for_transformers_tpu.retrieval.parser import DocumentParser
from intel_extension_for_transformers_tpu.utils.errorcode import ErrorCodes
from intel_extension_for_transformers_tpu.utils.error_utils import set_latest_error

logger = logging.getLogger(__name__)

# QA prompt (role parity with reference prompt/prompt_template.py
# generate_qa_prompt: context + query → grounded answer instruction)
QA_PROMPT_TEMPLATE = """Have a conversation with a human. You are required to generate a suitable response to the query from the human.
### Context: {context}
### Question: {question}
### Response:"""

NO_CONTEXT_TEMPLATE = """Have a conversation with a human, answer the following question as best you can.
### Question: {question}
### Response:"""


class RetrievalAgent:
    def __init__(
        self,
        embedder,
        input_path: Optional[str] = None,
        *,
        retrieval_type: str = "default",
        index_dtype: str = "bfloat16",
        persist_directory: Optional[str] = None,
        top_k: int = 4,
        threshold: float = 0.0,
        reranker=None,
        rerank_top_n: int = 3,
        chunk_size: int = 512,
        chunk_overlap: int = 32,
        documents: Optional[List[dict]] = None,
    ):
        if retrieval_type not in ("default", "child_parent", "bm25"):
            raise ValueError(f"unknown retrieval_type {retrieval_type!r}")
        self.embedder = embedder
        self.retrieval_type = retrieval_type
        self.top_k = top_k
        self.threshold = threshold
        self.reranker = reranker
        self.rerank_top_n = rerank_top_n
        self.persist_directory = persist_directory
        self.parser = DocumentParser(chunk_size=chunk_size, chunk_overlap=chunk_overlap)

        self.docs: List[dict] = []
        self.index: Optional[FlatIndex] = None
        self._index_dtype = index_dtype
        self._bm25: Optional[BM25Retriever] = None
        self._child_parent: Optional[ChildParentRetriever] = None
        if retrieval_type == "child_parent":
            self._child_parent = ChildParentRetriever(
                embedder, index_dtype=index_dtype, top_k=top_k
            )

        if persist_directory and os.path.exists(
            os.path.join(persist_directory, "index.json")
        ):
            self.reload_localdb(persist_directory)
        if input_path:
            self.append_localdb(input_path)
        if documents:
            self.add_documents(documents)

    # -- KB management (reference: retrieval_agent.py:211-291) --

    def append_localdb(self, input_path: str) -> None:
        docs = self.parser.load(input_path, chunk=self.retrieval_type != "child_parent")
        if not docs:
            set_latest_error(ErrorCodes.ERROR_RETRIEVAL_DOC_NOT_FOUND)
            raise ValueError(f"no parseable documents under {input_path}")
        self.add_documents(docs)

    def create(self, input_path: str) -> None:
        """Rebuild the KB from scratch (reference: create :255)."""
        self.docs = []
        self.index = None
        self._bm25 = None
        if self.retrieval_type == "child_parent":
            self._child_parent = ChildParentRetriever(
                self.embedder, index_dtype=self._index_dtype, top_k=self.top_k
            )
        self.append_localdb(input_path)

    def add_documents(self, docs: List[dict]) -> None:
        if self.retrieval_type == "child_parent":
            self._child_parent.add_documents(docs)
            return
        self.docs.extend(docs)
        if self.retrieval_type == "bm25":
            if self._bm25 is None:
                self._bm25 = BM25Retriever()
            self._bm25.add_documents(docs)
            return
        vecs = self.embedder.encode([d["content"] for d in docs])
        if self.index is None:
            self.index = FlatIndex(dim=vecs.shape[1], dtype=self._index_dtype)
        self.index.add(vecs)
        if self.persist_directory:
            self.save(self.persist_directory)

    def save(self, path: str) -> None:
        if self.index is not None:
            import json

            self.index.save(path)
            with open(os.path.join(path, "docs.json"), "w") as f:
                json.dump(self.docs, f)

    def reload_localdb(self, path: str) -> None:
        """(reference: reload_localdb :211-231)"""
        import json

        self.index = FlatIndex.load(path)
        with open(os.path.join(path, "docs.json")) as f:
            self.docs = json.load(f)

    # -- query path (reference: retrieval_agent.py:295-310 + adapter :55-64) --

    def get_context(self, query: str, k: Optional[int] = None) -> List[dict]:
        k = k or self.top_k
        if self.retrieval_type == "bm25":
            hits = self._bm25.get_relevant_documents(query, k=k) if self._bm25 else []
        elif self.retrieval_type == "child_parent":
            hits = self._child_parent.get_relevant_documents(query, k=k)
        else:
            if self.index is None or len(self.index) == 0:
                return []
            qv = self.embedder.encode([query], is_query=True)
            scores, ids = self.index.search(qv, k=min(k, len(self.index)))
            hits = []
            for s, i in zip(scores[0], ids[0]):
                if s >= self.threshold:
                    d = dict(self.docs[int(i)])
                    md = dict(d.get("metadata", {}))
                    md["score"] = float(s)
                    d["metadata"] = md
                    hits.append(d)
        if self.reranker is not None and hits:
            hits = self.reranker.rerank(query, hits, top_n=self.rerank_top_n)
        return hits

    def pre_llm_inference_actions(self, query: str) -> str:
        """Plugin hook: query → retrieval-augmented prompt
        (reference hook protocol: base_model.py:182-224)."""
        hits = self.get_context(query)
        if not hits:
            return NO_CONTEXT_TEMPLATE.format(question=query)
        context = "\n".join(d["content"] for d in hits)
        return QA_PROMPT_TEMPLATE.format(context=context, question=query)
