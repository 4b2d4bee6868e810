from intel_extension_for_transformers_tpu.models.bert import (
    BertConfig,
    bert_apply,
    bert_encode,
    bert_init_params,
)
from intel_extension_for_transformers_tpu.models.llama import (
    KVCache,
    LlamaConfig,
    init_kv_cache,
    llama_apply,
    llama_init_params,
)
from intel_extension_for_transformers_tpu.models.generation import (
    SamplingConfig,
    generate,
    generate_beam,
    generate_compiled,
    generate_stream,
)

__all__ = [
    "BertConfig",
    "bert_apply",
    "bert_encode",
    "bert_init_params",
    "KVCache",
    "LlamaConfig",
    "init_kv_cache",
    "llama_apply",
    "llama_init_params",
    "SamplingConfig",
    "generate",
    "generate_beam",
    "generate_compiled",
    "generate_stream",
]
