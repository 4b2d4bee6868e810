from intel_extension_for_transformers_tpu.integrations.instructor import (
    InstructorEmbedder,
    InstructorEmbeddings,
)
from intel_extension_for_transformers_tpu.integrations.langchain import (
    BgeReranker,
    Chroma,
    Document,
    HuggingFaceBgeEmbeddings,
    HuggingFaceEmbeddings,
)
from intel_extension_for_transformers_tpu.integrations.qdrant import Qdrant

__all__ = [
    "BgeReranker",
    "Chroma",
    "Document",
    "HuggingFaceBgeEmbeddings",
    "HuggingFaceEmbeddings",
    "InstructorEmbedder",
    "InstructorEmbeddings",
    "Qdrant",
]
