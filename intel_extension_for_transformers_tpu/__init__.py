"""TPU-native GenAI toolkit.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
intel/intel-extension-for-transformers (ITREX): low-bit model compression
(INT4/INT8/NF4/FP4 weight-only quantization, SmoothQuant-style activation
scaling, mixed precision), a quantization-aware model API, compression-aware
training, a chatbot framework with a RAG retrieval engine, and
OpenAI-compatible serving.

Public surface mirrors the reference's top-level exports
(reference: intel_extension_for_transformers/transformers/__init__.py:19-49)
but every implementation is TPU-first: weights live sharded in HBM over a
`jax.sharding.Mesh`, the hot GEMMs are Pallas kernels, and all collectives
ride ICI through pjit/shard_map.
"""

__version__ = "0.1.0"

# Lazy imports keep `import intel_extension_for_transformers_tpu` cheap; heavy
# submodules (models, retrieval) pull in jax tracing machinery only on use.
_LAZY = {
    # quantization config family (reference: transformers/utils/config.py:59-1118)
    "MixedPrecisionConfig": "intel_extension_for_transformers_tpu.quantization.config",
    "RtnConfig": "intel_extension_for_transformers_tpu.quantization.config",
    "GPTQConfig": "intel_extension_for_transformers_tpu.quantization.config",
    "AwqConfig": "intel_extension_for_transformers_tpu.quantization.config",
    "TeqConfig": "intel_extension_for_transformers_tpu.quantization.config",
    "AutoRoundConfig": "intel_extension_for_transformers_tpu.quantization.config",
    "SmoothQuantConfig": "intel_extension_for_transformers_tpu.quantization.config",
    "StaticQuantConfig": "intel_extension_for_transformers_tpu.quantization.config",
    "DynamicQuantConfig": "intel_extension_for_transformers_tpu.quantization.config",
    "QuantAwareTrainingConfig": "intel_extension_for_transformers_tpu.quantization.config",
    # model API (reference: transformers/modeling/modeling_auto.py:1993-2001)
    "AutoModelForCausalLM": "intel_extension_for_transformers_tpu.models.auto",
    "AutoModel": "intel_extension_for_transformers_tpu.models.auto",
    "AutoModelForSeq2SeqLM": "intel_extension_for_transformers_tpu.models.auto",
    "OptimizedModel": "intel_extension_for_transformers_tpu.models.auto",
    # training (reference: transformers/trainer.py:2033)
    "NLPTrainer": "intel_extension_for_transformers_tpu.trainer.trainer",
    # chat framework (reference: neural_chat/chatbot.py:103)
    "build_chatbot": "intel_extension_for_transformers_tpu.neural_chat.chatbot",
    "PipelineConfig": "intel_extension_for_transformers_tpu.neural_chat.config",
    "GenerationConfig": "intel_extension_for_transformers_tpu.neural_chat.config",
}


def __getattr__(name):
    mod = _LAZY.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
