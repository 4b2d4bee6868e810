"""Unbounded chat from a bounded KV cache: in-engine eviction policies.

Reference workflow: StreamingLLM / H2O long-context serving
(reference: modeling_gaudi/streaming_llm.py:37 enable_streaming_llm;
kv_cache_compression/prune/h2o.py:138 H2OKVCache). Here the policy is a
property of the continuous-batching ENGINE: when a slot's cache approaches
max_len it compacts in place (sinks+recent, or H2O heavy-hitters by
accumulated attention mass) and generation simply continues.

    python examples/unbounded_chat_eviction.py [--policy sink|h2o]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--policy", default="sink", choices=["sink", "h2o"])
    p.add_argument("--max-len", type=int, default=128)
    p.add_argument("--tokens", type=int, default=400)
    args = p.parse_args()

    import jax
    import numpy as np

    from intel_extension_for_transformers_tpu.models.engine import (
        DecodeEngine,
        EngineRequest,
    )
    from intel_extension_for_transformers_tpu.models.llama import (
        LlamaConfig,
        llama_init_params,
    )

    config = LlamaConfig.tiny(vocab_size=256, hidden_size=64,
                              intermediate_size=128)
    params = llama_init_params(jax.random.PRNGKey(0), config)

    eng = DecodeEngine(
        params, config, max_slots=2, max_len=args.max_len,
        kv_policy=args.policy,
        kv_sink=4, kv_recent=args.max_len // 2,
        kv_heavy=args.max_len // 4,
    ).start()
    try:
        req = eng.submit(EngineRequest(
            np.arange(1, 17, dtype=np.int32),
            max_new_tokens=args.tokens,
        ))
        n = sum(1 for _ in req.tokens())
        s = eng.stats()
        print(f"policy={args.policy}: generated {n} tokens through a "
              f"{args.max_len}-position cache "
              f"({s['kv_compactions']} compactions, cache never grew)")
        assert n == args.tokens
    finally:
        eng.stop()


if __name__ == "__main__":
    main()
