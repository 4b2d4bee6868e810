"""Compat mirror of `intel_extension_for_transformers.transformers.trainer`
(reference: transformers/trainer.py — NLPTrainer and the seq2seq alias)."""

from intel_extension_for_transformers_tpu.trainer.trainer import (  # noqa: F401
    NLPSeq2SeqTrainer,
    NLPTrainer,
)
