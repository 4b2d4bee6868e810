from intel_extension_for_transformers_tpu.retrieval.index import (
    FlatIndex,
    IVFIndex,
    ShardedFlatIndex,
    ShardedIVFIndex,
)
from intel_extension_for_transformers_tpu.retrieval.synthetic import (
    clustered_embeddings,
    gaussian_embeddings,
    exact_topk,
    recall_at_k,
)
from intel_extension_for_transformers_tpu.retrieval.splitter import (
    RecursiveCharacterTextSplitter,
)
from intel_extension_for_transformers_tpu.retrieval.parser import DocumentParser
from intel_extension_for_transformers_tpu.retrieval.bm25 import BM25Retriever
from intel_extension_for_transformers_tpu.retrieval.embedder import (
    TextEmbedder,
    SimpleTokenizer,
)
from intel_extension_for_transformers_tpu.retrieval.reranker import (
    CrossEncoderReranker,
)
from intel_extension_for_transformers_tpu.retrieval.child_parent import (
    ChildParentRetriever,
)
from intel_extension_for_transformers_tpu.retrieval.agent import RetrievalAgent

__all__ = [
    "FlatIndex",
    "IVFIndex",
    "ShardedFlatIndex",
    "ShardedIVFIndex",
    "clustered_embeddings",
    "gaussian_embeddings",
    "exact_topk",
    "recall_at_k",
    "RecursiveCharacterTextSplitter",
    "DocumentParser",
    "BM25Retriever",
    "TextEmbedder",
    "SimpleTokenizer",
    "CrossEncoderReranker",
    "ChildParentRetriever",
    "RetrievalAgent",
]
