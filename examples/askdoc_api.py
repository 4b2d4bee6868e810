"""askdoc (RAG-as-API) + continuous batching client example.

Starts an in-process server with the retrieval + finetune routers and the
continuous-batching engine enabled, builds a knowledge base over HTTP, asks
it questions, and fires concurrent chat requests that decode together in the
slot pool (reference: restful retrieval/finetune routers, restful/api.py).

    python examples/askdoc_api.py
"""

from __future__ import annotations

import json
import os
import sys
import threading
from http.client import HTTPConnection

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def req(port, method, path, body=None):
    conn = HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request(
        method, path,
        json.dumps(body) if body is not None else None,
        {"Content-Type": "application/json"} if body is not None else {},
    )
    r = conn.getresponse()
    out = json.loads(r.read())
    conn.close()
    return out


def main():
    import jax

    from intel_extension_for_transformers_tpu.models.bert import (
        BertConfig,
        bert_init_params,
    )
    from intel_extension_for_transformers_tpu.models.llama import (
        LlamaConfig,
        llama_init_params,
    )
    from intel_extension_for_transformers_tpu.models.tokenization import (
        ByteTokenizer,
    )
    from intel_extension_for_transformers_tpu.neural_chat.server import (
        NeuralChatServerExecutor,
    )
    from intel_extension_for_transformers_tpu.retrieval.embedder import TextEmbedder

    config = LlamaConfig.tiny(vocab_size=260)
    params = llama_init_params(jax.random.PRNGKey(0), config)
    bcfg = BertConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, max_position_embeddings=128,
    )
    embedder = TextEmbedder(
        bert_init_params(jax.random.PRNGKey(1), bcfg), bcfg, max_length=128
    )

    executor = NeuralChatServerExecutor()
    executor.init(
        {
            "host": "127.0.0.1",
            "port": 0,
            "model_name_or_path": "tiny-demo",
            "tasks_list": ["textchat", "models", "health", "retrieval", "finetune"],
            "loading_config": {"preloaded": (params, config, ByteTokenizer())},
            "generation_config": {"max_new_tokens": 12, "do_sample": False,
                                  "repetition_penalty": 1.0},
            "serving_config": {"continuous_batching": True, "max_slots": 4},
            "askdoc_config": {"embedder": embedder, "top_k": 2},
        }
    )
    executor.run(block=False)
    port = executor.port
    print("serving on", port)

    kb = req(port, "POST", "/v1/askdoc/create", {
        "documents": [
            {"content": "TPUs multiply matrices in a systolic array."},
            {"content": "Group-wise int4 scales bound quantization error."},
            {"content": "Paris is the capital of France."},
        ]
    })
    print("created KB:", kb)
    ans = req(port, "POST", "/v1/askdoc/chat", {
        "query": "How do TPUs multiply?", "knowledge_base_id": kb["knowledge_base_id"],
    })
    print("top context:", ans["context"][0]["content"])

    # concurrent chats through the slot pool
    results = {}

    def chat(i):
        results[i] = req(port, "POST", "/v1/chat/completions", {
            "messages": [{"role": "user", "content": f"hello {i}"}],
        })

    threads = [threading.Thread(target=chat, args=(i,)) for i in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    print("concurrent responses:", len(results),
          "engine steps:", executor.app.engine._steps)
    executor.stop()


if __name__ == "__main__":
    main()
