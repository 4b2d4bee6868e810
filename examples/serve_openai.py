"""Start the OpenAI-compatible server and exercise it with the client.

Reference workflow: neuralchat_server --config_file neuralchat.yaml
(reference: neural_chat/server/neuralchat_server.py). This demo boots an
in-process server on a tiny model and round-trips /v1/chat/completions.

    python examples/serve_openai.py                 # offline demo
    python examples/serve_openai.py --model <hf>    # real model
    # or production style:
    python -m intel_extension_for_transformers_tpu.neural_chat.server \
        --config_file intel_extension_for_transformers_tpu/neural_chat/server/config/neuralchat.yaml
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--stay-up", action="store_true", help="serve forever")
    args = p.parse_args()

    from intel_extension_for_transformers_tpu.neural_chat.server import (
        NeuralChatServerExecutor,
        TextChatClientExecutor,
    )

    config = {
        "host": "127.0.0.1",
        "port": args.port,
        "model_name_or_path": args.model or "tiny-llama-demo",
        "generation_config": {"max_new_tokens": 32},
    }
    if not args.model:  # offline: preload a tiny random llama
        import jax

        from intel_extension_for_transformers_tpu.models.llama import (
            LlamaConfig,
            llama_init_params,
        )
        from intel_extension_for_transformers_tpu.models.tokenization import (
            ByteTokenizer,
        )

        cfg = LlamaConfig.tiny(vocab_size=259)
        params = llama_init_params(jax.random.PRNGKey(0), cfg)
        config["loading_config"] = {"preloaded": (params, cfg, ByteTokenizer())}

    executor = NeuralChatServerExecutor()
    assert executor.init(config), "server init failed"
    executor.run(block=args.stay_up and args.port != 0)
    if args.stay_up:
        return
    print(f"server on 127.0.0.1:{executor.port}")

    client = TextChatClientExecutor("127.0.0.1", executor.port)
    print("health:", client.health())
    print("models:", client.models())
    print("chat:", repr(client.chat("hello there", max_tokens=8)))
    print("stream:", "".join(client.chat_stream("tell me more", max_tokens=8))[:60])
    executor.stop()


if __name__ == "__main__":
    main()
