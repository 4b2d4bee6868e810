"""Robustness / edge-case tests across the public surface (the reference's
exception-path coverage, neural_chat/tests/ci/api/test_chatbot_exceed_cases
pattern)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_init_params,
)


def test_quantize_skips_incompatible_k():
    """Weights whose K can't satisfy the group constraints stay float and the
    model still runs (reference behavior: INC skips unsupported layers)."""
    from intel_extension_for_transformers_tpu.quantization import (
        RtnConfig,
        quantize_model,
    )

    params = {"odd": {"kernel": jnp.ones((130, 256))},  # K=130: 65 % 64 != 0
              "good": {"kernel": jnp.ones((256, 256))}}
    qp = quantize_model(params, RtnConfig(weight_dtype="int4", group_size=64))
    assert any("good" in p for p in qp.quantized_paths)
    assert not any("odd" in p for p in qp.quantized_paths)
    assert hasattr(qp.params["odd"]["kernel"], "dtype")  # still a plain array


def test_modules_to_not_convert():
    from intel_extension_for_transformers_tpu.quantization import (
        RtnConfig,
        quantize_model,
    )

    cfg = LlamaConfig.tiny()
    params = llama_init_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_model(
        params,
        RtnConfig(weight_dtype="int8", group_size=32,
                  modules_to_not_convert=["lm_head"]),
    )
    assert not any("lm_head" in p for p in qp.quantized_paths)
    assert any("attention" in p for p in qp.quantized_paths)


def test_build_chatbot_unknown_plugin_sets_error():
    from intel_extension_for_transformers_tpu.neural_chat import (
        PipelineConfig,
        build_chatbot,
    )
    from intel_extension_for_transformers_tpu.neural_chat.plugins import (
        reset_plugins,
    )
    from intel_extension_for_transformers_tpu.utils import get_latest_error

    reset_plugins()
    bot = build_chatbot(
        PipelineConfig(model_name_or_path="x", plugins={"nope": {}})
    )
    assert bot is None
    assert get_latest_error() is not None
    reset_plugins()


def test_empty_index_raises():
    from intel_extension_for_transformers_tpu.retrieval.index import FlatIndex

    idx = FlatIndex(dim=8)
    with pytest.raises(ValueError):
        idx.search(np.zeros((1, 8), np.float32), k=1)


def test_generation_zero_max_tokens():
    from intel_extension_for_transformers_tpu.models.generation import (
        SamplingConfig,
        generate,
    )

    cfg = LlamaConfig.tiny()
    params = llama_init_params(jax.random.PRNGKey(0), cfg)
    out = generate(
        params, cfg, np.arange(4, dtype=np.int32),
        SamplingConfig(max_new_tokens=0),
    )
    assert out.size == 0


def test_splitter_rejects_bad_overlap():
    from intel_extension_for_transformers_tpu.retrieval.splitter import (
        RecursiveCharacterTextSplitter,
    )

    with pytest.raises(ValueError):
        RecursiveCharacterTextSplitter(chunk_size=10, chunk_overlap=10)


def test_low_bit_dir_missing_config(tmp_path):
    from intel_extension_for_transformers_tpu.models.auto import OptimizedModel

    with pytest.raises(ValueError):
        OptimizedModel.from_pretrained(str(tmp_path))


def test_server_rejects_unknown_task_route():
    import jax as _jax

    from intel_extension_for_transformers_tpu.models.tokenization import (
        ByteTokenizer,
    )
    from intel_extension_for_transformers_tpu.neural_chat.server import (
        ChatApp,
    )
    from intel_extension_for_transformers_tpu.neural_chat.base_model import (
        BaseModel,
    )

    cfg = LlamaConfig.tiny()
    bot = BaseModel("tiny")
    bot.params = llama_init_params(_jax.random.PRNGKey(0), cfg)
    bot.model_config = cfg
    bot.tokenizer = ByteTokenizer()
    app = ChatApp(bot, "tiny", api_list=["models"])  # textchat disabled
    status, _ = app.route("POST", "/v1/chat/completions", {"messages": []})
    assert status == 404  # route gated off by tasks_list
