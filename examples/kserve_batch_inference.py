"""KServe v2 (Triton-protocol) batch inference against the server.

Reference workflow: the Triton python-backend text-generation model
(reference: neural_chat/serving/triton/text_generation/model.py — BYTES
INPUT0 → OUTPUT0 with dynamic batching). This server speaks the same wire
protocol at /v2; a multi-prompt batch decodes concurrently in the
continuous-batching slot pool.

    python examples/kserve_batch_inference.py
"""

from __future__ import annotations

import json
import os
import sys
from urllib.request import Request, urlopen

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

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

    config = LlamaConfig.tiny(vocab_size=256, hidden_size=64,
                              intermediate_size=128)
    params = llama_init_params(jax.random.PRNGKey(0), config)
    ex = NeuralChatServerExecutor()
    ok = ex.init({
        "host": "127.0.0.1", "port": 0, "model_name_or_path": "demo",
        "loading_config": {"preloaded": (params, config, ByteTokenizer())},
        "generation_config": {"max_new_tokens": 16, "do_sample": False,
                              "repetition_penalty": 1.0},
        "serving_config": {"continuous_batching": True, "max_slots": 4,
                           "max_len": 128},
    })
    assert ok
    ex.run(block=False)
    base = f"http://127.0.0.1:{ex.port}"
    try:
        meta = json.loads(urlopen(base + "/v2", timeout=60).read())
        print("server:", meta)
        print("model:", json.loads(
            urlopen(base + "/v2/models/demo", timeout=60).read()))
        body = json.dumps({
            "inputs": [{"name": "INPUT0", "datatype": "BYTES", "shape": [3],
                        "data": ["tell me a story",
                                 "summarize the plot",
                                 "translate to french"]}],
            "parameters": {"max_tokens": 12, "temperature": 0},
        }).encode()
        out = json.loads(urlopen(
            Request(base + "/v2/models/demo/infer", body,
                    {"Content-Type": "application/json"}), timeout=300,
        ).read())
        for i, text in enumerate(out["outputs"][0]["data"]):
            print(f"[{i}] {text!r}")
        print("steps:", ex.app.engine.stats()["decode_steps"],
              "(3 prompts decoded concurrently)")
    finally:
        ex.stop()


if __name__ == "__main__":
    main()
