"""Compat mirror of `intel_extension_for_transformers.transformers.modeling`
(reference: transformers/modeling/__init__.py) — the auto-model classes."""

from intel_extension_for_transformers_tpu.models.auto import (  # noqa: F401
    AutoModel,
    AutoModelForCausalLM,
    AutoModelForSeq2SeqLM,
    OptimizedModel,
)
