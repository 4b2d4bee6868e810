from intel_extension_for_transformers_tpu.neural_chat.server.neuralchat_server import (
    ChatApp,
    NeuralChatServerExecutor,
    make_server,
)
from intel_extension_for_transformers_tpu.neural_chat.server.neuralchat_client import (
    TextChatClientExecutor,
)

__all__ = [
    "ChatApp",
    "NeuralChatServerExecutor",
    "TextChatClientExecutor",
    "make_server",
]
