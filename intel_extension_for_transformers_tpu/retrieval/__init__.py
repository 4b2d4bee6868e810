from intel_extension_for_transformers_tpu.retrieval.index import (
    FlatIndex,
    IVFIndex,
    ShardedFlatIndex,
)
from intel_extension_for_transformers_tpu.retrieval.splitter import (
    RecursiveCharacterTextSplitter,
)
from intel_extension_for_transformers_tpu.retrieval.parser import DocumentParser
from intel_extension_for_transformers_tpu.retrieval.bm25 import BM25Retriever

__all__ = [
    "FlatIndex",
    "IVFIndex",
    "ShardedFlatIndex",
    "RecursiveCharacterTextSplitter",
    "DocumentParser",
    "BM25Retriever",
]
