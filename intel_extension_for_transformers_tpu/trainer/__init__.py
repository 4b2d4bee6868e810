from intel_extension_for_transformers_tpu.trainer.configs import (
    DistillationConfig,
    DPOConfig,
    PruningConfig,
    TrainingArguments,
)
from intel_extension_for_transformers_tpu.trainer.dpo import DPOTrainer
from intel_extension_for_transformers_tpu.trainer.ppo import (
    PPOConfig,
    PPOTrainer,
    value_head_init,
)
from intel_extension_for_transformers_tpu.trainer.finetuning import (
    Finetuning,
    pack_text_dataset,
)
from intel_extension_for_transformers_tpu.trainer.lora import (
    LoraConfig,
    attach_lora,
    load_adapter,
    lora_init,
    merge_lora,
    save_adapter,
)
from intel_extension_for_transformers_tpu.trainer.trainer import (
    NLPSeq2SeqTrainer,
    NLPTrainer,
    causal_lm_loss,
)

__all__ = [
    "DistillationConfig",
    "DPOConfig",
    "DPOTrainer",
    "Finetuning",
    "LoraConfig",
    "NLPSeq2SeqTrainer",
    "NLPTrainer",
    "PPOConfig",
    "PPOTrainer",
    "PruningConfig",
    "value_head_init",
    "TrainingArguments",
    "attach_lora",
    "causal_lm_loss",
    "load_adapter",
    "lora_init",
    "merge_lora",
    "pack_text_dataset",
    "save_adapter",
]
