"""Auto-model API: one-call quantized model loading.

TPU-native re-creation of the reference's model API
(reference: transformers/modeling/modeling_auto.py:363
`_BaseQBitsAutoModelClass.from_pretrained` — branch on quantization_config /
load_in_4bit / load_in_8bit, convert, pack; :209 `save_low_bit`;
:1312 `load_low_bit`; model.py:39 `OptimizedModel.from_pretrained`).

Differences by design (TPU-first):
- Models are functional param trees + pure apply fns, not module graphs; a
  thin stateful wrapper (`TpuCausalLM` / `TpuEncoderModel`) carries
  params+config+tokenizer and exposes generate()/encode().
- HF torch checkpoints are converted ONCE on host (hf_convert) and torch
  never touches the compute path.
- `save_low_bit`/`load_low_bit` persist packed int4/int8/nf4/fp4 weights as
  a self-contained npz + json dir — reloading never re-quantizes.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.bert import (
    BertConfig,
    bert_encode,
)
from intel_extension_for_transformers_tpu.models.generation import (
    SamplingConfig,
    generate as _generate,
    generate_stream as _generate_stream,
)
from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    init_kv_cache,
    llama_apply,
)
from intel_extension_for_transformers_tpu.quantization.config import (
    QuantizationConfigMixin,
    RtnConfig,
)
from intel_extension_for_transformers_tpu.quantization.quantize import (
    QuantizedParams,
    quantize_model,
)
from intel_extension_for_transformers_tpu.quantization.save_load import (
    load_low_bit as _load_low_bit,
    save_low_bit as _save_low_bit,
)

MODEL_CONFIG_NAME = "tpu_model_config.json"

# model_type → (config class, wrapper class name) filled in below
_ENCODER_TYPES = {"bert", "roberta", "bge", "minilm"}
_LLAMA_TYPES = {"llama", "mistral", "qwen2"}  # llama-architecture family
# generic-decoder families (models/decoder.py; reference model_type menu
# modeling_auto.py:325-347) — derived from the converter registry so new
# families (stablelm/chatglm/gemma/baichuan/qwen/… and aliases) route here
# automatically instead of falling through to the llama converter.
def _generic_types() -> set:
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        _DECODER_CONVERTERS,
    )

    return set(_DECODER_CONVERTERS)


class _GenericTypes:
    def __contains__(self, model_type) -> bool:
        return model_type in _generic_types()

    def __iter__(self):
        return iter(sorted(_generic_types()))


_GENERIC_TYPES = _GenericTypes()


def _config_to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


class _TpuModelBase:
    """Shared persistence + sharding for wrapped models."""

    model_type: str = ""

    def __init__(self, params, config, tokenizer=None, quantization_config=None):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.quantization_config = quantization_config

    # -- persistence ------------------------------------------------------
    def save_low_bit(self, save_dir: str) -> None:
        """Persist packed weights + model config (reference:
        modeling_auto.py:209)."""
        qp = QuantizedParams(self.params, self.quantization_config, [])
        _save_low_bit(qp, save_dir)
        with open(os.path.join(save_dir, MODEL_CONFIG_NAME), "w") as f:
            json.dump(
                {
                    "model_type": self.model_type,
                    "config": _config_to_dict(self.config),
                },
                f,
                indent=1,
            )
        if self.tokenizer is not None and hasattr(self.tokenizer, "save_pretrained"):
            try:
                self.tokenizer.save_pretrained(save_dir)
            except Exception:  # tokenizer persistence is best-effort
                pass

    save_pretrained = save_low_bit

    @classmethod
    def _read_model_config(cls, save_dir: str) -> tuple[str, dict]:
        with open(os.path.join(save_dir, MODEL_CONFIG_NAME)) as f:
            d = json.load(f)
        return d["model_type"], d["config"]


class TpuCausalLM(_TpuModelBase):
    """Llama-family causal LM: params tree + generate()."""

    model_type = "llama"

    # -- forward ----------------------------------------------------------
    def __call__(self, input_ids, cache=None):
        """→ (logits, cache). Fresh cache sized to the prompt if None."""
        from intel_extension_for_transformers_tpu.models.registry import (
            get_apply_fn,
        )

        ids = jnp.asarray(input_ids)
        if ids.ndim == 1:
            ids = ids[None, :]
        if cache is None:
            cache = init_kv_cache(self.config, ids.shape[0], ids.shape[1])
        return get_apply_fn(self.config)(self.params, self.config, ids, cache)

    # -- generation -------------------------------------------------------
    def generate(self, input_ids, sampling: Optional[SamplingConfig] = None, **kw):
        if kw.get("num_beams", 1) > 1:
            # HF-style generate(num_beams=N) → compiled beam search
            from intel_extension_for_transformers_tpu.models.generation import (
                generate_beam,
            )

            ids, _ = generate_beam(
                self.params, self.config, input_ids,
                num_beams=int(kw["num_beams"]),
                max_new_tokens=int(
                    kw.get("max_new_tokens")
                    or (sampling.max_new_tokens if sampling else 32)
                ),
                length_penalty=float(kw.get("length_penalty", 1.0)),
                eos_token_id=kw.get("eos_token_id"),
            )
            return ids[None]  # (1, n) — same batch-major shape as generate
        return _generate(self.params, self.config, input_ids, sampling, **kw)

    def generate_stream(
        self, input_ids, sampling: Optional[SamplingConfig] = None, **kw
    ):
        return _generate_stream(self.params, self.config, input_ids, sampling, **kw)


class TpuEncoderModel(_TpuModelBase):
    """BERT/BGE-family encoder: params tree + encode()."""

    model_type = "bert"

    def encode(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        pooling: str = "cls",
        normalize: bool = True,
    ):
        return bert_encode(
            self.params,
            self.config,
            jnp.asarray(input_ids),
            None if attention_mask is None else jnp.asarray(attention_mask),
            None if token_type_ids is None else jnp.asarray(token_type_ids),
            pooling=pooling,
            normalize=normalize,
        )

    __call__ = encode


def _is_low_bit_dir(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(
        os.path.join(path, MODEL_CONFIG_NAME)
    )


def _resolve_quant_config(
    quantization_config, load_in_4bit: bool, load_in_8bit: bool
) -> Optional[QuantizationConfigMixin]:
    """Reference branch logic (modeling_auto.py:553-575): explicit config
    wins; otherwise load_in_4bit→RTN int4, load_in_8bit→RTN int8."""
    if quantization_config is not None:
        return quantization_config
    if load_in_4bit:
        return RtnConfig(weight_dtype="int4", group_size=128)
    if load_in_8bit:
        return RtnConfig(weight_dtype="int8", group_size=128)
    return None


def _load_hf(model_name_or_path: str, cls: str, **hf_kwargs):
    """Load a torch checkpoint on host CPU (load-time-only dependency)."""
    import transformers as hf

    loader = getattr(hf, cls)
    return loader.from_pretrained(model_name_or_path, **hf_kwargs)


def _load_tokenizer(model_name_or_path: str):
    try:
        import transformers as hf

        return hf.AutoTokenizer.from_pretrained(model_name_or_path)
    except Exception:
        return None


def _wrap_from_low_bit_dir(path: str):
    model_type, cfg_dict = _TpuModelBase._read_model_config(path)
    qp = _load_low_bit(path)
    tokenizer = _load_tokenizer(path)
    if model_type in _ENCODER_TYPES:
        m = TpuEncoderModel(
            qp.params, BertConfig(**cfg_dict), tokenizer, qp.config
        )
        m.model_type = model_type
        return m
    if model_type in ("t5", "mt5"):
        from intel_extension_for_transformers_tpu.models.t5 import T5Config

        m = TpuSeq2SeqModel(qp.params, T5Config(**cfg_dict), tokenizer, qp.config)
        m.model_type = model_type
        return m
    if model_type in _GENERIC_TYPES:
        from intel_extension_for_transformers_tpu.models.decoder import (
            DecoderConfig,
        )

        cfg = DecoderConfig(**cfg_dict)
    else:
        cfg = LlamaConfig(**cfg_dict)
    m = TpuCausalLM(qp.params, cfg, tokenizer, qp.config)
    m.model_type = model_type
    return m


class AutoModelForCausalLM:
    """Reference: transformers/__init__.py:43 `AutoModelForCausalLM` —
    `from_pretrained(..., quantization_config=RtnConfig())` loads + quantizes
    in one call; `load_low_bit` reloads packed weights."""

    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path: str,
        quantization_config: Optional[QuantizationConfigMixin] = None,
        load_in_4bit: bool = False,
        load_in_8bit: bool = False,
        calib_inputs=None,
        **hf_kwargs,
    ) -> TpuCausalLM:
        if _is_low_bit_dir(str(pretrained_model_name_or_path)):
            model = _wrap_from_low_bit_dir(str(pretrained_model_name_or_path))
            if not isinstance(model, TpuCausalLM):
                raise ValueError(
                    f"{pretrained_model_name_or_path} holds an encoder, "
                    "use AutoModel"
                )
            return model
        hf_model = _load_hf(
            pretrained_model_name_or_path, "AutoModelForCausalLM", **hf_kwargs
        )
        tokenizer = _load_tokenizer(pretrained_model_name_or_path)
        return cls.from_hf_model(
            hf_model,
            quantization_config=quantization_config,
            load_in_4bit=load_in_4bit,
            load_in_8bit=load_in_8bit,
            tokenizer=tokenizer,
            calib_inputs=calib_inputs,
        )

    @classmethod
    def from_hf_model(
        cls,
        hf_model,
        quantization_config=None,
        load_in_4bit: bool = False,
        load_in_8bit: bool = False,
        tokenizer=None,
        calib_inputs=None,
    ) -> TpuCausalLM:
        """Convert an already-instantiated HF torch model (used by tests —
        tiny-model substitution, reference tests/CI/test_weight_only.py:75)."""
        from intel_extension_for_transformers_tpu.models.hf_convert import (
            decoder_params_from_hf,
            llama_params_from_hf,
        )

        if hf_model.config.model_type in _GENERIC_TYPES:
            params, config = decoder_params_from_hf(hf_model)
        else:
            params, config = llama_params_from_hf(hf_model)
        qcfg = _resolve_quant_config(quantization_config, load_in_4bit, load_in_8bit)
        if qcfg is not None:
            qp = quantize_model(params, qcfg, calib_inputs=calib_inputs)
            model = TpuCausalLM(qp.params, config, tokenizer, qp.config)
        else:
            model = TpuCausalLM(params, config, tokenizer, None)
        model.model_type = getattr(config, "model_type", "llama")
        return model

    @classmethod
    def load_low_bit(cls, save_dir: str) -> TpuCausalLM:
        model = _wrap_from_low_bit_dir(save_dir)
        assert isinstance(model, TpuCausalLM)
        return model


class AutoModel:
    """Encoder loader (reference: transformers/__init__.py:44 `AutoModel`)."""

    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path: str,
        quantization_config: Optional[QuantizationConfigMixin] = None,
        load_in_4bit: bool = False,
        load_in_8bit: bool = False,
        **hf_kwargs,
    ) -> TpuEncoderModel:
        if _is_low_bit_dir(str(pretrained_model_name_or_path)):
            model = _wrap_from_low_bit_dir(str(pretrained_model_name_or_path))
            if not isinstance(model, TpuEncoderModel):
                raise ValueError(
                    f"{pretrained_model_name_or_path} holds a decoder, "
                    "use AutoModelForCausalLM"
                )
            return model
        hf_model = _load_hf(pretrained_model_name_or_path, "AutoModel", **hf_kwargs)
        tokenizer = _load_tokenizer(pretrained_model_name_or_path)
        return cls.from_hf_model(
            hf_model,
            quantization_config=quantization_config,
            load_in_4bit=load_in_4bit,
            load_in_8bit=load_in_8bit,
            tokenizer=tokenizer,
        )

    @classmethod
    def from_hf_model(
        cls,
        hf_model,
        quantization_config=None,
        load_in_4bit: bool = False,
        load_in_8bit: bool = False,
        tokenizer=None,
        calib_inputs=None,
    ) -> TpuEncoderModel:
        from intel_extension_for_transformers_tpu.models.hf_convert import (
            bert_params_from_hf,
        )

        params, config = bert_params_from_hf(hf_model)
        qcfg = _resolve_quant_config(quantization_config, load_in_4bit, load_in_8bit)
        if qcfg is not None:
            qp = quantize_model(params, qcfg, calib_inputs=calib_inputs)
            return TpuEncoderModel(qp.params, config, tokenizer, qp.config)
        return TpuEncoderModel(params, config, tokenizer, None)

    @classmethod
    def load_low_bit(cls, save_dir: str) -> TpuEncoderModel:
        model = _wrap_from_low_bit_dir(save_dir)
        assert isinstance(model, TpuEncoderModel)
        return model


class TpuSeq2SeqModel(_TpuModelBase):
    """T5-family encoder-decoder (reference: AutoModelForSeq2SeqLM export)."""

    model_type = "t5"

    def __call__(self, input_ids, decoder_input_ids, attention_mask=None):
        from intel_extension_for_transformers_tpu.models.t5 import t5_apply

        return t5_apply(
            self.params,
            self.config,
            jnp.asarray(input_ids),
            jnp.asarray(decoder_input_ids),
            None if attention_mask is None else jnp.asarray(attention_mask),
        )

    def generate(self, input_ids, max_new_tokens: int = 32, **kw):
        from intel_extension_for_transformers_tpu.models.t5 import t5_generate

        return t5_generate(
            self.params, self.config, input_ids, max_new_tokens=max_new_tokens,
            **kw,
        )


class AutoModelForSeq2SeqLM:
    """(reference: transformers/__init__.py:49 `AutoModelForSeq2SeqLM`)."""

    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path: str,
        quantization_config: Optional[QuantizationConfigMixin] = None,
        load_in_4bit: bool = False,
        load_in_8bit: bool = False,
        **hf_kwargs,
    ) -> TpuSeq2SeqModel:
        if _is_low_bit_dir(str(pretrained_model_name_or_path)):
            model = _wrap_from_low_bit_dir(str(pretrained_model_name_or_path))
            if not isinstance(model, TpuSeq2SeqModel):
                raise ValueError(
                    f"{pretrained_model_name_or_path} is not a seq2seq model"
                )
            return model
        hf_model = _load_hf(
            pretrained_model_name_or_path, "AutoModelForSeq2SeqLM", **hf_kwargs
        )
        tokenizer = _load_tokenizer(pretrained_model_name_or_path)
        return cls.from_hf_model(
            hf_model,
            quantization_config=quantization_config,
            load_in_4bit=load_in_4bit,
            load_in_8bit=load_in_8bit,
            tokenizer=tokenizer,
        )

    @classmethod
    def from_hf_model(
        cls,
        hf_model,
        quantization_config=None,
        load_in_4bit: bool = False,
        load_in_8bit: bool = False,
        tokenizer=None,
        calib_inputs=None,
    ) -> TpuSeq2SeqModel:
        from intel_extension_for_transformers_tpu.models.t5 import (
            t5_params_from_hf,
        )

        params, config = t5_params_from_hf(hf_model)
        qcfg = _resolve_quant_config(quantization_config, load_in_4bit, load_in_8bit)
        if qcfg is not None:
            qp = quantize_model(params, qcfg, calib_inputs=calib_inputs)
            return TpuSeq2SeqModel(qp.params, config, tokenizer, qp.config)
        return TpuSeq2SeqModel(params, config, tokenizer, None)

    @classmethod
    def load_low_bit(cls, save_dir: str) -> TpuSeq2SeqModel:
        model = _wrap_from_low_bit_dir(save_dir)
        assert isinstance(model, TpuSeq2SeqModel)
        return model


class OptimizedModel:
    """Transparent reload of any saved optimized model
    (reference: transformers/modeling/model.py:39)."""

    @classmethod
    def from_pretrained(cls, save_dir: str, **kw):
        if not _is_low_bit_dir(str(save_dir)):
            raise ValueError(
                f"{save_dir} is not a saved optimized model "
                f"(missing {MODEL_CONFIG_NAME})"
            )
        return _wrap_from_low_bit_dir(str(save_dir))
