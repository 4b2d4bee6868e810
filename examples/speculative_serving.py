"""Speculative continuous-batching serving: draft model inside the slot pool.

Reference workflow: assistant-model speculative decoding
(reference: transformers/modeling/modeling_auto.py generation kwargs) fused
with vLLM-style continuous batching (modeling_auto.py:364-533) — here both
live in ONE engine: per-slot draft-and-verify with per-slot accepted
lengths.

    python examples/speculative_serving.py          # in-process demo
"""

from __future__ import annotations

import json
import os
import sys
import threading
import urllib.request

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

    # a real deployment loads target + a smaller draft checkpoint whose
    # proposals mostly agree; random-init models agree on nothing, so this
    # demo self-drafts (draft == target → full acceptance) to show the
    # schedule — swap in a real small checkpoint for `(draft, draft_cfg)`
    config = LlamaConfig.tiny(vocab_size=260, hidden_size=128)
    params = llama_init_params(jax.random.PRNGKey(0), config)
    draft, draft_cfg = params, config

    ex = NeuralChatServerExecutor()
    ex.init({
        "model_name_or_path": "spec-demo",
        "port": 0,
        "loading_config": {
            "preloaded": (params, config, ByteTokenizer()),
            "assistant_model": (draft, draft_cfg),
        },
        # speculation accelerates GREEDY slots (sampled/penalized slots fall
        # back to exact one-token steps), so serve greedy defaults here
        "generation_config": {
            "do_sample": False,
            "repetition_penalty": 1.0,
        },
        "serving_config": {
            "continuous_batching": True,
            "max_slots": 4,
            "max_len": 512,
            "num_speculative_tokens": 4,
        },
    })
    ex.run(block=False)
    print(f"serving on :{ex.port} (speculative slot pool)")

    def chat(msg):
        body = json.dumps({
            "model": "spec-demo",
            "messages": [{"role": "user", "content": msg}],
            "max_tokens": 48,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{ex.port}/v1/chat/completions",
            body, {"Content-Type": "application/json"},
        )
        out = json.loads(urllib.request.urlopen(req, timeout=600).read())
        return out["choices"][0]["message"]["content"]

    steps0 = ex.engine._steps
    threads, results = [], [None] * 4
    for i in range(4):
        t = threading.Thread(
            target=lambda i=i: results.__setitem__(i, chat(f"prompt {i}"))
        )
        t.start()
        threads.append(t)
    for t in threads:
        t.join()
    used = ex.engine._steps - steps0
    print(f"4 concurrent × 48 tokens in {used} engine steps "
          f"(plain batching would need ~48; speculation accepts multi-token "
          f"runs per step)")
    ex.stop()


if __name__ == "__main__":
    main()
