"""Haystack import-path compatibility package.

The reference ships `intel_extension_for_transformers.haystack` as a named
integration surface (reference: haystack/__init__.py:1 — an import-path
package whose classes are resolved by the haystack framework's component
loader). Here the same path exposes the TPU retrieval primitives in
haystack's vocabulary: a DocumentStore (vector search over FlatIndex), an
Embedder, and a Ranker — so `from intel_extension_for_transformers_tpu.
haystack import ...` works as a drop-in for pipelines that imported the
reference path.
"""

from intel_extension_for_transformers_tpu.integrations.langchain import (
    BgeReranker as Ranker,
    Document,
    HuggingFaceBgeEmbeddings as Embedder,
)
from intel_extension_for_transformers_tpu.integrations.qdrant import (
    Qdrant as DocumentStore,
)

__all__ = ["Document", "DocumentStore", "Embedder", "Ranker"]
