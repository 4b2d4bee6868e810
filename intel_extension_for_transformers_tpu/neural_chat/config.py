"""Chat framework configs.

Parity with the reference's config surface
(reference: neural_chat/config.py — GenerationConfig :400, LoadingModelConfig
:426, PipelineConfig :466), adapted to TPU: device knobs become mesh/dtype
knobs, `optimization_config` takes our quantization configs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class GenerationConfig:
    max_new_tokens: int = 256
    temperature: float = 0.9
    top_k: int = 40
    top_p: float = 0.75
    do_sample: bool = True
    repetition_penalty: float = 1.1
    num_beams: int = 1
    bad_words_ids: Optional[List[int]] = None
    force_words_ids: Optional[List[int]] = None
    use_hpu_graphs: bool = False  # accepted for API parity; ignored on TPU
    cache_max_length: Optional[int] = None
    return_stats: bool = False
    task: str = ""
    seed: int = 0

    def to_sampling_config(self, eos_token_id: Optional[int] = None):
        from intel_extension_for_transformers_tpu.models.generation import (
            SamplingConfig,
        )

        return SamplingConfig(
            max_new_tokens=self.max_new_tokens,
            do_sample=self.do_sample,
            temperature=self.temperature,
            top_k=self.top_k,
            top_p=self.top_p,
            repetition_penalty=self.repetition_penalty,
            eos_token_id=eos_token_id,
        )


@dataclass
class LoadingModelConfig:
    """(reference: config.py:426) — how to materialize the model."""

    optimization_config: Any = None  # quantization/mixed-precision config
    use_cache: bool = True
    world_size: int = 1  # mesh data-parallel degree
    tensor_parallel: int = 1  # mesh tensor-parallel degree
    cache_dtype: str = "bfloat16"
    # test/offline injection: preloaded (params, model_config, tokenizer)
    preloaded: Optional[tuple] = None
    # speculative decoding draft (reference: assistant_model,
    # model_utils.py:503): HF name/path, or preloaded (params, model_config)
    assistant_model: Any = None
    spec_k: int = 4  # draft tokens proposed per verification round


@dataclass
class FinetuningConfig:
    """Maps to trainer.finetune (reference: BaseFinetuningConfig)."""

    model_name_or_path: str = ""
    train_file: Optional[str] = None
    dataset_name: Optional[str] = None
    lora_rank: int = 8
    lora_alpha: int = 16
    lora_dropout: float = 0.0
    qlora: bool = False
    learning_rate: float = 1e-4
    num_train_epochs: int = 1
    max_steps: int = -1
    per_device_train_batch_size: int = 2
    max_seq_length: int = 512
    output_dir: str = "./finetuned"


@dataclass
class PipelineConfig:
    """(reference: config.py:466) — what build_chatbot consumes."""

    model_name_or_path: str = "meta-llama/Llama-2-7b-chat-hf"
    tokenizer_name_or_path: Optional[str] = None
    device: str = "tpu"
    loading_config: LoadingModelConfig = field(default_factory=LoadingModelConfig)
    generation_config: GenerationConfig = field(default_factory=GenerationConfig)
    plugins: Dict[str, Dict] = field(default_factory=dict)
    task: str = "chat"
