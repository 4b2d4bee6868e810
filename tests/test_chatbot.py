"""Chat framework tests: build_chatbot, plugins, hooks, adapters.

Models reference neural_chat/tests/ci/api/ (test_chatbot_build_api.py,
test_chatbot_normal_cases.py, test_chatbot_exceed_cases.py, test_rag.py).
"""

import numpy as np
import pytest

import jax

from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_init_params,
)
from intel_extension_for_transformers_tpu.models.tokenization import ByteTokenizer
from intel_extension_for_transformers_tpu.neural_chat import (
    GenerationConfig,
    LoadingModelConfig,
    PipelineConfig,
    build_chatbot,
)
from intel_extension_for_transformers_tpu.neural_chat.plugins import (
    get_plugin_instance,
    reset_plugins,
)
from intel_extension_for_transformers_tpu.utils import get_latest_error


@pytest.fixture(autouse=True)
def _clean_plugins():
    reset_plugins()
    yield
    reset_plugins()


@pytest.fixture(scope="module")
def tiny_llama():
    config = LlamaConfig.tiny()
    params = llama_init_params(jax.random.PRNGKey(0), config)
    return params, config, ByteTokenizer()


def _pipeline(tiny_llama, **kw):
    params, config, tok = tiny_llama
    return PipelineConfig(
        model_name_or_path="tiny-llama-test",
        loading_config=LoadingModelConfig(preloaded=(params, config, tok)),
        generation_config=GenerationConfig(
            max_new_tokens=8, do_sample=False, temperature=1.0, repetition_penalty=1.0
        ),
        **kw,
    )


def test_build_chatbot_and_predict(tiny_llama):
    bot = build_chatbot(_pipeline(tiny_llama))
    assert bot is not None
    out = bot.predict("hello there")
    assert isinstance(out, str)


def test_predict_stream_yields_deltas(tiny_llama):
    bot = build_chatbot(_pipeline(tiny_llama))
    deltas = list(bot.predict_stream("hi"))
    assert "".join(deltas) == bot.predict("hi")


def test_build_chatbot_unknown_plugin_sets_error(tiny_llama):
    bot = build_chatbot(_pipeline(tiny_llama, plugins={"bogus_plugin": {}}))
    assert bot is None
    from intel_extension_for_transformers_tpu.utils.errorcode import ErrorCodes

    assert get_latest_error() == ErrorCodes.ERROR_PLUGIN_NOT_SUPPORTED


def test_build_chatbot_bad_model_sets_error():
    cfg = PipelineConfig(model_name_or_path="/nonexistent/model/path-xyz")
    bot = build_chatbot(cfg)
    assert bot is None
    assert get_latest_error() is not None


def test_safety_plugin_blocks_and_filters(tiny_llama):
    bot = build_chatbot(
        _pipeline(tiny_llama, plugins={"safety_checker": {"extra_words": ["forbiddenword"]}})
    )
    out = bot.predict("tell me about forbiddenword")
    assert "sensitive" in out.lower()


def test_cache_plugin_returns_cached_answer(tiny_llama):
    bot = build_chatbot(_pipeline(tiny_llama, plugins={"cache": {}}))
    first = bot.predict("what is a tpu")
    cache = get_plugin_instance("cache")
    assert cache.get("what is a tpu") == first
    # identical query short-circuits generation
    again = bot.predict("what is a tpu")
    assert again == first


def test_memory_plugin_records_turns(tiny_llama):
    bot = build_chatbot(_pipeline(tiny_llama, plugins={"memory": {"max_turns": 2}}))
    bot.predict("q1")
    bot.predict("q2")
    bot.predict("q3")
    mem = get_plugin_instance("memory")
    assert len(mem.turns) == 2
    assert mem.turns[-1][0] == "q3"


def test_retrieval_plugin_augments_prompt(tiny_llama, tmp_path):
    (tmp_path / "facts.txt").write_text(
        "The zorblatt bird is native to the planet Zorblax and eats crystals."
    )
    from intel_extension_for_transformers_tpu.models.bert import (
        BertConfig,
        bert_init_params,
    )
    from intel_extension_for_transformers_tpu.retrieval.embedder import TextEmbedder

    bcfg = BertConfig.tiny()
    embedder = TextEmbedder(
        bert_init_params(jax.random.PRNGKey(1), bcfg), bcfg, max_length=64
    )
    bot = build_chatbot(
        _pipeline(
            tiny_llama,
            plugins={
                "retrieval": {
                    "embedder": embedder,
                    "input_path": str(tmp_path),
                    "index_dtype": "float32",
                }
            },
        )
    )
    assert bot is not None
    agent = get_plugin_instance("retrieval")
    prompt = agent.pre_llm_inference_actions("what does the zorblatt bird eat?")
    assert "zorblatt" in prompt.lower()
    out = bot.predict("what does the zorblatt bird eat?")
    assert isinstance(out, str)


def test_adapter_dispatch():
    from intel_extension_for_transformers_tpu.neural_chat.base_model import (
        get_model_adapter,
    )
    from intel_extension_for_transformers_tpu.neural_chat.adapters import (
        LlamaModel,
        MistralModel,
    )

    assert isinstance(get_model_adapter("meta-llama/Llama-2-7b"), LlamaModel)
    assert isinstance(get_model_adapter("mistralai/Mistral-7B"), MistralModel)


def test_conv_templates():
    from intel_extension_for_transformers_tpu.neural_chat.prompts import (
        get_conv_template,
    )

    conv = get_conv_template("meta-llama/Llama-2-7b-chat")
    assert conv.name == "llama-2"
    conv = get_conv_template("some-unknown-model")
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], "")
    assert "hi" in conv.get_prompt()


def test_assistant_model_speculative_chat(tiny_llama):
    """Chatbot with an assistant (draft) model: greedy output must equal the
    plain path exactly (reference: assistant_model, model_utils.py:503)."""
    params, config, tok = tiny_llama
    gen = GenerationConfig(
        max_new_tokens=8, do_sample=False, temperature=0.0,
        repetition_penalty=1.0,
    )
    plain = build_chatbot(
        PipelineConfig(
            model_name_or_path="tiny-llama-test",
            loading_config=LoadingModelConfig(preloaded=(params, config, tok)),
            generation_config=gen,
        )
    )
    ref = plain.predict("hello there")
    reset_plugins()
    spec = build_chatbot(
        PipelineConfig(
            model_name_or_path="tiny-llama-test",
            loading_config=LoadingModelConfig(
                preloaded=(params, config, tok),
                assistant_model=(params, config),  # self-draft: all accepted
                spec_k=3,
            ),
            generation_config=gen,
        )
    )
    assert spec.assistant is not None
    out = spec.predict("hello there")
    assert out == ref
