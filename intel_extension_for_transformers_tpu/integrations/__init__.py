from intel_extension_for_transformers_tpu.integrations.langchain import (
    BgeReranker,
    Chroma,
    Document,
    HuggingFaceBgeEmbeddings,
    HuggingFaceEmbeddings,
)

__all__ = [
    "BgeReranker",
    "Chroma",
    "Document",
    "HuggingFaceBgeEmbeddings",
    "HuggingFaceEmbeddings",
]
