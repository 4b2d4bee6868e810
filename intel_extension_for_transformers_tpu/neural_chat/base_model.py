"""BaseModel: the chat inference core with the plugin hook protocol.

Parity with the reference's BaseModel
(reference: neural_chat/models/base_model.py:71-275 — predict/predict_stream
run plugin pre-hooks (cache → asr → retrieval → safety), prompt templating
per model family, the LLM call, then post-hooks (safety → tts);
register_model_adapter :180). The LLM call is our JAX generate loop; models
are (params, model_config, tokenizer) triples instead of torch modules.
"""

from __future__ import annotations

import logging
from typing import Iterator, List, Optional

import numpy as np

from intel_extension_for_transformers_tpu.neural_chat.config import GenerationConfig
from intel_extension_for_transformers_tpu.neural_chat.plugins import (
    get_plugin_instance,
    is_plugin_enabled,
    plugins,
)
from intel_extension_for_transformers_tpu.neural_chat.prompts import get_conv_template
from intel_extension_for_transformers_tpu.utils.errorcode import ErrorCodes
from intel_extension_for_transformers_tpu.utils.error_utils import set_latest_error

logger = logging.getLogger(__name__)

# pre-hook execution order (reference: base_model.py:184-224)
PRE_HOOK_ORDER = ["cache", "asr", "retrieval", "safety_checker"]
POST_HOOK_ORDER = ["safety_checker", "tts"]


class BaseModel:
    def __init__(self, model_name: str = ""):
        self.model_name = model_name
        self.params = None
        self.model_config = None
        self.tokenizer = None
        self.generation_config = GenerationConfig()
        self.conv_template = None
        self.kv_policy = None
        self.assistant = None  # (params, config) draft for speculative decode
        self.spec_k = 4

    # -- loading ---------------------------------------------------------
    def load_model(self, kwargs: dict) -> None:
        """kwargs: model_name_or_path, loading_config, generation_config.
        (reference: adapter.load_model(params), base_model.py → model_utils
        load_model :413)."""
        from intel_extension_for_transformers_tpu.neural_chat.config import (
            LoadingModelConfig,
        )

        name = kwargs.get("model_name_or_path", self.model_name)
        self.model_name = name
        loading: LoadingModelConfig = kwargs.get("loading_config") or LoadingModelConfig()
        self.generation_config = kwargs.get("generation_config") or GenerationConfig()

        if loading.preloaded is not None:
            self.params, self.model_config, self.tokenizer = loading.preloaded
        else:
            import transformers

            from intel_extension_for_transformers_tpu.models.hf_convert import (
                llama_params_from_hf,
            )

            try:
                hf = transformers.AutoModelForCausalLM.from_pretrained(name)
            except Exception as e:
                set_latest_error(ErrorCodes.ERROR_MODEL_NOT_FOUND)
                raise ValueError(f"failed to load model {name!r}: {e}") from e
            self.params, self.model_config = llama_params_from_hf(hf)
            self.tokenizer = transformers.AutoTokenizer.from_pretrained(name)

        if loading.optimization_config is not None:
            self.params = self.optimize(loading.optimization_config)
        if loading.tensor_parallel > 1 or loading.world_size > 1:
            self.shard(dp=loading.world_size, tp=loading.tensor_parallel)

        # speculative-decoding draft model (reference: assistant_model path,
        # model_utils.py:503-516)
        self.assistant = None
        self.spec_k = loading.spec_k
        if loading.assistant_model is not None:
            if isinstance(loading.assistant_model, tuple):
                self.assistant = loading.assistant_model  # (params, config)
            else:
                import transformers

                from intel_extension_for_transformers_tpu.models.hf_convert import (
                    llama_params_from_hf,
                )

                hf_d = transformers.AutoModelForCausalLM.from_pretrained(
                    loading.assistant_model
                )
                self.assistant = llama_params_from_hf(hf_d)
        self.conv_template = get_conv_template(self.model_name)

    def optimize(self, optimization_config):
        """(reference: optimize_model chatbot.py:355)"""
        from intel_extension_for_transformers_tpu.quantization import quantize_model

        return quantize_model(self.params, optimization_config).params

    def shard(self, dp: int = 1, tp: int = 1) -> None:
        import jax

        from intel_extension_for_transformers_tpu.models.llama import llama_param_axes
        from intel_extension_for_transformers_tpu.parallel import (
            create_mesh,
            shard_params,
        )

        n = dp * tp
        if n > len(jax.devices()):
            raise ValueError(f"requested {n} devices, have {len(jax.devices())}")
        mesh = create_mesh(dp=dp, tp=tp, devices=jax.devices()[:n])
        axes = llama_param_axes(self.model_config)
        self.params = shard_params(self.params, axes, mesh)
        self.mesh = mesh

    # -- tokenization helpers -------------------------------------------
    def _encode_prompt(self, prompt: str) -> np.ndarray:
        if hasattr(self.tokenizer, "encode"):
            ids = self.tokenizer.encode(prompt)
            if hasattr(ids, "ids"):
                ids = ids.ids
        else:
            enc = self.tokenizer(prompt)
            ids = enc["input_ids"]
        return np.asarray([ids], np.int32)

    def _decode(self, ids: List[int]) -> str:
        return self.tokenizer.decode(ids, skip_special_tokens=True)

    @property
    def _eos_id(self) -> Optional[int]:
        return getattr(self.tokenizer, "eos_token_id", None)

    # -- hook runners ----------------------------------------------------
    def _run_pre_hooks(self, query: str):
        """→ (prompt_or_query, early_response_or_None)"""
        for name in PRE_HOOK_ORDER:
            if not is_plugin_enabled(name):
                continue
            inst = get_plugin_instance(name)
            if inst is None or not hasattr(inst, "pre_llm_inference_actions"):
                continue
            result = inst.pre_llm_inference_actions(query)
            if isinstance(result, dict) and result.get("stop_inference"):
                return query, result.get("response", "")
            if isinstance(result, str):
                query = result
        return query, None

    def _run_post_hooks(self, response: str) -> str:
        for name in POST_HOOK_ORDER:
            if not is_plugin_enabled(name):
                continue
            inst = get_plugin_instance(name)
            if inst is not None and hasattr(inst, "post_llm_inference_actions"):
                out = inst.post_llm_inference_actions(response)
                if isinstance(out, str):
                    response = out
        return response

    # -- prediction ------------------------------------------------------
    def prepare_prompt(self, query: str, task: str = "chat") -> str:
        conv = self.conv_template.copy() if self.conv_template else get_conv_template()
        conv.append_message(conv.roles[0], query)
        conv.append_message(conv.roles[1], "")
        return conv.get_prompt()

    def predict(self, query: str, config: Optional[GenerationConfig] = None) -> str:
        """(reference: base_model.py:275 predict)"""
        return "".join(self.predict_stream(query, config))

    def predict_stream(
        self, query: str, config: Optional[GenerationConfig] = None
    ) -> Iterator[str]:
        """(reference: base_model.py:150 predict_stream)"""
        config = config or self.generation_config
        prompt, early = self._run_pre_hooks(query)
        if early is not None:
            yield self._run_post_hooks(early)
            return
        # retrieval plugin returns a full prompt; otherwise apply template
        if prompt == query:
            prompt = self.prepare_prompt(query, config.task)

        from intel_extension_for_transformers_tpu.models.generation import (
            detokenize_stream,
            generate_stream,
        )

        ids = self._encode_prompt(prompt)
        sampling = config.to_sampling_config(self._eos_id)
        try:
            if getattr(config, "num_beams", 1) > 1 and not config.do_sample:
                # beam search (reference: HF generate(num_beams=N) kwargs);
                # one compiled program, so the "stream" is the final result
                from intel_extension_for_transformers_tpu.models.generation import (
                    generate_beam,
                )

                beam_ids, _ = generate_beam(
                    self.params, self.model_config, ids,
                    num_beams=config.num_beams,
                    max_new_tokens=config.max_new_tokens,
                    eos_token_id=self._eos_id,
                )

                def _beam_iter(beam_ids=beam_ids):
                    for t in beam_ids:
                        yield np.asarray([t], np.int32)

                token_iter = _beam_iter()
            elif self.assistant is not None and self.kv_policy is None:
                # assistant-model speculative decoding (reference:
                # model_utils.py:503) — draft proposes, target verifies
                from intel_extension_for_transformers_tpu.models.speculative import (
                    generate_speculative_stream,
                )

                d_params, d_config = self.assistant
                chunks = generate_speculative_stream(
                    self.params,
                    self.model_config,
                    d_params,
                    d_config,
                    ids,
                    sampling,
                    spec_k=self.spec_k,
                    seed=config.seed,
                )

                def _per_token(chunks=chunks):
                    for chunk in chunks:
                        for t in np.asarray(chunk).reshape(-1):
                            yield np.asarray([t], np.int32)

                token_iter = _per_token()
            else:
                token_iter = generate_stream(
                    self.params,
                    self.model_config,
                    ids,
                    sampling,
                    max_cache_length=config.cache_max_length,
                    seed=config.seed,
                    kv_policy=self.kv_policy,
                )
            pieces = []
            for delta in detokenize_stream(token_iter, self.tokenizer):
                pieces.append(delta)
                yield self._run_post_hooks(delta) if _hooks_are_streaming_safe() else delta
            # cache the full exchange
            if is_plugin_enabled("cache"):
                cache = get_plugin_instance("cache")
                if cache is not None:
                    cache.put(query, "".join(pieces))
            if is_plugin_enabled("memory"):
                mem = get_plugin_instance("memory")
                if mem is not None:
                    mem.add(query, "".join(pieces))
        except Exception as e:  # pragma: no cover
            set_latest_error(ErrorCodes.ERROR_GENERATION_FAIL)
            logger.exception("generation failed")
            raise


def _hooks_are_streaming_safe() -> bool:
    # safety filter on per-token deltas would mangle words split across
    # tokens; the reference applies post-hooks to the final text only for
    # streams. Keep the same behavior.
    return False


# -- adapter registry (reference: base_model.py:180 register_model_adapter) --

_MODEL_ADAPTERS: list = []


def register_model_adapter(cls) -> None:
    _MODEL_ADAPTERS.append(cls())


def get_model_adapter(model_name_or_path: str) -> BaseModel:
    low = model_name_or_path.lower()
    for adapter in _MODEL_ADAPTERS:
        if adapter.match(low):
            m = type(adapter)(model_name_or_path)
            return m
    return BaseModel(model_name_or_path)
