from intel_extension_for_transformers_tpu.models.bert import (
    BertConfig,
    bert_apply,
    bert_encode,
    bert_init_params,
)
from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_apply,
    llama_init_params,
)

__all__ = [
    "BertConfig",
    "bert_apply",
    "bert_encode",
    "bert_init_params",
    "LlamaConfig",
    "llama_apply",
    "llama_init_params",
]
