"""Finetuning engine: LoRA / QLoRA on (optionally quantized) base models.

Reference: transformers/llm/finetuning/finetuning.py:286 `Finetuning.finetune`
— CLM path with PEFT lora and QLoRA-on-4bit-base; here the adapter is a
separate pytree trained by a jitted step while the base (float or packed
int4) stays frozen in HBM (trainer/lora.py). neural_chat.finetune_model
routes here.
"""

from __future__ import annotations

import logging
import os
from typing import Any, List, Optional

import numpy as np

import jax

from intel_extension_for_transformers_tpu.trainer.configs import TrainingArguments
from intel_extension_for_transformers_tpu.trainer.lora import (
    LoraConfig,
    attach_lora,
    lora_init,
    merge_lora,
    save_adapter,
)
from intel_extension_for_transformers_tpu.trainer.trainer import (
    NLPTrainer,
    causal_lm_loss,
)

logger = logging.getLogger(__name__)


def pack_text_dataset(
    texts: List[str], tokenizer, max_seq_length: int = 512
) -> List[dict]:
    """Tokenize + pack texts into fixed-length blocks (static shapes for the
    TPU; the group_texts move of reference data_utils.py)."""
    ids: List[int] = []
    for t in texts:
        got = tokenizer.encode(t)
        ids.extend(got.ids if hasattr(got, "ids") else got)
    blocks = []
    for i in range(0, len(ids) - max_seq_length + 1, max_seq_length):
        blocks.append(
            {"input_ids": np.asarray(ids[i : i + max_seq_length], np.int32)}
        )
    if not blocks and ids:
        pad = max_seq_length - len(ids)
        blocks.append(
            {"input_ids": np.asarray(ids + [0] * pad, np.int32)}
        )
    return blocks


class Finetuning:
    """(reference: finetuning.py:286) — builds the LoRA train loop."""

    def __init__(self, finetune_config):
        self.config = finetune_config

    def finetune(
        self,
        params: Any = None,
        model_config: Any = None,
        tokenizer=None,
        texts: Optional[List[str]] = None,
        dataset: Optional[list] = None,
        mesh=None,
    ):
        """→ (lora_tree, LoraConfig). Also saves the adapter to output_dir."""
        cfg = self.config
        if params is None:
            from intel_extension_for_transformers_tpu.models.auto import (
                AutoModelForCausalLM,
            )
            from intel_extension_for_transformers_tpu.quantization.config import (
                RtnConfig,
            )

            qc = RtnConfig(weight_dtype="nf4", group_size=128) if cfg.qlora else None
            model = AutoModelForCausalLM.from_pretrained(
                cfg.model_name_or_path, quantization_config=qc
            )
            params, model_config, tokenizer = (
                model.params,
                model.config,
                model.tokenizer,
            )

        if dataset is None:
            if texts is None:
                if not cfg.train_file:
                    raise ValueError("need texts, dataset, or train_file")
                with open(cfg.train_file) as f:
                    texts = [ln.strip() for ln in f if ln.strip()]
            dataset = pack_text_dataset(texts, tokenizer, cfg.max_seq_length)

        lora_cfg = LoraConfig(
            r=cfg.lora_rank,
            lora_alpha=cfg.lora_alpha,
            lora_dropout=cfg.lora_dropout,
        )
        lora = lora_init(jax.random.PRNGKey(0), params, lora_cfg)

        from intel_extension_for_transformers_tpu.models.llama import llama_apply

        def apply_with_adapter(adapter, ids, mask=None):
            merged = attach_lora(params, adapter, lora_cfg.scaling)
            logits, _ = llama_apply(merged, model_config, ids, None, mask)
            return logits

        args = TrainingArguments(
            learning_rate=cfg.learning_rate,
            num_train_epochs=cfg.num_train_epochs,
            max_steps=cfg.max_steps,
            per_device_train_batch_size=cfg.per_device_train_batch_size,
            output_dir=cfg.output_dir,
        )
        trainer = NLPTrainer(
            params=lora,  # the TRAINABLE tree is the adapter
            apply_fn=apply_with_adapter,
            args=args,
            train_dataset=dataset,
            mesh=mesh,
        )
        out = trainer.train()
        lora = out.params
        os.makedirs(cfg.output_dir, exist_ok=True)
        save_adapter(lora, lora_cfg, cfg.output_dir)
        logger.info(
            "finetune done: %d steps, loss %.4f → %s",
            out.global_step,
            out.training_loss,
            cfg.output_dir,
        )
        return lora, lora_cfg

    @staticmethod
    def merge_and_save(params, lora, lora_cfg: LoraConfig, model_config,
                       save_dir: str):
        """Fold the adapter into a float base and persist (reference: PEFT
        merge_and_unload before save)."""
        from intel_extension_for_transformers_tpu.models.auto import TpuCausalLM

        merged = merge_lora(params, lora, lora_cfg.scaling)
        TpuCausalLM(merged, model_config).save_low_bit(save_dir)
        return merged
