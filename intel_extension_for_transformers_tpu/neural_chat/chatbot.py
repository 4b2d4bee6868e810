"""build_chatbot / finetune_model / optimize_model — the chat framework API.

Parity with the reference's top-level chat API
(reference: neural_chat/chatbot.py:103 build_chatbot — adapter dispatch by
model name :133-179, plugin registration :183-281, load_model :310;
finetune_model :316; optimize_model :355), with the reference's error-code
reporting threaded through (chatbot.py:118-132).
"""

from __future__ import annotations

import logging
from typing import Optional

from intel_extension_for_transformers_tpu.neural_chat.base_model import (
    BaseModel,
    get_model_adapter,
)
import intel_extension_for_transformers_tpu.neural_chat.adapters  # noqa: F401 — registers adapters
import intel_extension_for_transformers_tpu.neural_chat.chat_plugins  # noqa: F401 — registers plugins
from intel_extension_for_transformers_tpu.neural_chat.config import PipelineConfig
from intel_extension_for_transformers_tpu.neural_chat.plugins import (
    enable_plugin,
    plugins,
)
from intel_extension_for_transformers_tpu.utils.errorcode import ErrorCodes
from intel_extension_for_transformers_tpu.utils.error_utils import (
    clear_latest_error,
    set_latest_error,
)

logger = logging.getLogger(__name__)

KNOWN_PLUGINS = (
    "cache",
    "safety_checker",
    "retrieval",
    "memory",
    "ner",
    "image2image",
    "asr",
    "tts",
)


def build_chatbot(config: Optional[PipelineConfig] = None) -> Optional[BaseModel]:
    """Create a chatbot (reference: chatbot.py:103). Returns None and sets
    the latest error code on failure, like the reference."""
    clear_latest_error()
    config = config or PipelineConfig()

    adapter = get_model_adapter(config.model_name_or_path)

    # plugin registration (reference: chatbot.py:183-281)
    for name, args in (config.plugins or {}).items():
        if name not in KNOWN_PLUGINS:
            set_latest_error(ErrorCodes.ERROR_PLUGIN_NOT_SUPPORTED)
            logger.error("unsupported plugin %r", name)
            return None
        plugin_args = dict(args or {})
        enabled = plugin_args.pop("enable", True)
        if not enabled:
            continue
        if name == "retrieval":
            _build_retrieval_plugin(plugin_args)
        else:
            enable_plugin(name, **plugin_args)

    try:
        adapter.load_model(
            {
                "model_name_or_path": config.model_name_or_path,
                "loading_config": config.loading_config,
                "generation_config": config.generation_config,
            }
        )
    except ValueError:
        # load_model already set a specific error code
        return None
    except MemoryError:
        set_latest_error(ErrorCodes.ERROR_OUT_OF_MEMORY)
        return None
    return adapter


def _build_retrieval_plugin(args: dict) -> None:
    """Wire the RAG agent as the 'retrieval' plugin instance
    (reference: Agent_QA init, chatbot.py:269)."""
    from intel_extension_for_transformers_tpu.neural_chat.plugins import plugins
    from intel_extension_for_transformers_tpu.retrieval.agent import RetrievalAgent

    embedder = args.pop("embedder", None)
    if embedder is None:
        model = args.pop("embedding_model", "BAAI/bge-small-en-v1.5")
        from intel_extension_for_transformers_tpu.retrieval.embedder import (
            TextEmbedder,
        )

        embedder = TextEmbedder.from_pretrained(model)
    input_path = args.pop("input_path", None)
    agent = RetrievalAgent(embedder, input_path, **args)
    plugins.setdefault(
        "retrieval", {"enable": True, "class": None, "args": {}, "instance": None}
    )
    plugins["retrieval"]["enable"] = True
    plugins["retrieval"]["instance"] = agent


def optimize_model(params, optimization_config):
    """(reference: chatbot.py:355 optimize_model)"""
    from intel_extension_for_transformers_tpu.quantization import quantize_model

    return quantize_model(params, optimization_config).params


def finetune_model(finetune_config) -> None:
    """(reference: chatbot.py:316 finetune_model)"""
    from intel_extension_for_transformers_tpu.trainer.finetuning import Finetuning

    return Finetuning(finetune_config).finetune()
