"""Training-side config dataclasses.

Mirrors the reference's compression-training knobs (reference: INC-backed
`quantization.QuantizationAwareTrainingConfig`, `pruner` configs, and
`DistillationConfig` consumed by NLPTrainer — transformers/trainer.py:281-427)
as plain serializable dataclasses.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class TrainingArguments:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    num_train_epochs: int = 1
    # jax.checkpoint each decoder layer in the train step (HF analogue:
    # gradient_checkpointing) — O(1)-in-depth activation memory
    gradient_checkpointing: bool = False
    max_steps: int = -1  # >0 overrides epochs
    per_device_train_batch_size: int = 8
    gradient_accumulation_steps: int = 1
    warmup_steps: int = 0
    logging_steps: int = 10
    save_steps: int = 0  # >0: orbax checkpoint every N steps to output_dir
    seed: int = 0
    max_grad_norm: float = 1.0
    bf16: bool = True  # compute dtype for activations
    output_dir: str = "./output"


@dataclass
class PruningConfig:
    """Magnitude pruning with a cubic sparsity schedule
    (reference: pruner configs routed through INC, trainer.py:333)."""

    target_sparsity: float = 0.9
    pruning_type: str = "magnitude"
    start_step: int = 0
    end_step: int = -1  # -1 → last step
    update_frequency: int = 1
    excluded_names: List[str] = field(default_factory=list)


@dataclass
class DistillationConfig:
    """KD loss config (reference: distillation via INC callbacks,
    trainer.py:362)."""

    temperature: float = 2.0
    alpha_ce: float = 0.5  # weight on hard-label CE; (1-alpha) on KL to teacher
    loss_types: List[str] = field(default_factory=lambda: ["CE", "KL"])


@dataclass
class DPOConfig:
    """Direct preference optimization (reference: dpo_trainer.py)."""

    beta: float = 0.1
    label_smoothing: float = 0.0
    learning_rate: float = 5e-6
    max_steps: int = 100
    logging_steps: int = 10
    seed: int = 0
