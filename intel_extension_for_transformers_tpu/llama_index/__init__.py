"""LlamaIndex import-path compatibility package.

The reference ships `intel_extension_for_transformers.llama_index` as a
named integration surface (reference: llama_index/__init__.py:1). Here the
same path exposes the TPU retrieval primitives in llama_index's
vocabulary: a VectorStore, an embedding class, and a node postprocessor
(reranker) — the three integration points llama_index pipelines use.
"""

from intel_extension_for_transformers_tpu.integrations.langchain import (
    BgeReranker as SentenceTransformerRerank,
    Document,
    HuggingFaceBgeEmbeddings as HuggingFaceEmbedding,
)
from intel_extension_for_transformers_tpu.integrations.qdrant import (
    Qdrant as QdrantVectorStore,
)

__all__ = [
    "Document",
    "HuggingFaceEmbedding",
    "QdrantVectorStore",
    "SentenceTransformerRerank",
]
