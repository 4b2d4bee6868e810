"""Config-type → apply-fn dispatch (the model registry).

The TPU analogue of the reference's per-arch adapter dispatch
(reference: MODELS registry model_utils.py:501 + model_type branches in
modeling_auto.py): every decoder family shares the (params, config,
input_ids, cache, attention_mask) → (logits, cache) contract, so generation,
speculative decoding, evaluation, and serving stay arch-agnostic."""

from __future__ import annotations


def get_apply_fn(config):
    from intel_extension_for_transformers_tpu.models.decoder import (
        DecoderConfig,
        decoder_apply,
    )
    from intel_extension_for_transformers_tpu.models.llama import (
        LlamaConfig,
        llama_apply,
    )

    if isinstance(config, LlamaConfig):
        return llama_apply
    if isinstance(config, DecoderConfig):
        return decoder_apply
    raise TypeError(f"no apply fn registered for {type(config).__name__}")
