"""GPT-J-6B INT4 decode benchmark — the reference's headline LLM number.

Reference baseline (BASELINE.md / docs/release_data.md:147-165): GPT-J-6B
INT4 (group 128) next-token latency 21.56 ms on a 48-core SPR socket; MPT-7B
34.76 ms; Falcon-7B 35.84 ms.

This benchmark builds the same-architecture model with packed random int4
weights DIRECTLY (no float stage — random bytes decode to random int4
values, compute cost is identical to real weights) and times the jitted
decode step inside one lax.fori_loop on the TPU (per-dispatch relay latency
excluded, see utils/benchmark.py).

    python benchmarks/bench_gptj_int4.py [--arch gptj|mpt|falcon|llama2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASELINES_MS = {"gptj": 21.56, "mpt": 34.76, "falcon": 35.84,
                "gpt_neox": 60.35, "llama2": None}


_KEY = [0]


def _next_key():
    import jax

    _KEY[0] += 1
    return jax.random.PRNGKey(_KEY[0])


def random_qt(rng, K, N, group_size=128):
    """Random packed weight generated ON DEVICE (uploading GBs of random
    bytes through the TPU relay would dominate the benchmark's setup)."""
    import jax
    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.ops.packing import QuantizedTensor

    k1, k2 = jax.random.split(_next_key())
    data = jax.random.randint(k1, (K // 2, N), -128, 128, jnp.int8)
    scales = jax.random.uniform(k2, (K // group_size, N), jnp.float32,
                                0.005, 0.025)
    return QuantizedTensor(
        data=data,
        scales=scales,
        zeros=None,
        weight_dtype="int4",
        scheme="sym",
        group_size=group_size,
        K=K,
        N=N,
    )


def build_params(config, rng, group_size=128, dtype="bfloat16"):
    """Quantized param tree straight from random bytes (no f32 stage)."""
    import jax.numpy as jnp

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    h, i = config.hidden_size, config.intermediate_size
    hd = config.head_dim
    nh, nkv = config.num_attention_heads, config.num_key_value_heads

    def arr(*shape, scale=0.02):
        import jax

        return jax.random.normal(_next_key(), shape, dt) * scale

    def lin(K, N, bias):
        p = {"kernel": random_qt(rng, K, N, group_size)}
        if bias:
            p["bias"] = jnp.zeros((N,), dt)
        return p

    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig
    from intel_extension_for_transformers_tpu.models.llama import LlamaConfig

    if isinstance(config, LlamaConfig):
        layers = []
        for _ in range(config.num_hidden_layers):
            layers.append(
                {
                    "input_norm": jnp.ones((h,), dt),
                    "attention": {
                        "q": lin(h, nh * hd, False),
                        "k": lin(h, nkv * hd, False),
                        "v": lin(h, nkv * hd, False),
                        "o": lin(nh * hd, h, False),
                    },
                    "post_norm": jnp.ones((h,), dt),
                    "mlp": {
                        "gate": lin(h, i, False),
                        "up": lin(h, i, False),
                        "down": lin(i, h, False),
                    },
                }
            )
        return {
            "embed_tokens": arr(config.vocab_size, h),
            "layers": layers,
            "final_norm": jnp.ones((h,), dt),
            "lm_head": lin(h, config.vocab_size, False),
        }

    assert isinstance(config, DecoderConfig)
    ab, mb = config.attention_bias, config.mlp_bias
    layers = []
    for _ in range(config.num_hidden_layers):
        layer = {
            "ln1": {"scale": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
            "attention": {
                "q": lin(h, nh * hd, ab),
                "k": lin(h, nkv * hd, ab),
                "v": lin(h, nkv * hd, ab),
                "o": lin(nh * hd, h, ab),
            },
            "mlp": {"up": lin(h, i, mb), "down": lin(i, h, mb)},
        }
        if not (config.parallel_residual and config.shared_ln):
            layer["ln2"] = {
                "scale": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)
            }
        layers.append(layer)
    params = {
        "embed_tokens": arr(config.vocab_size, h),
        "layers": layers,
        "final_norm": {"scale": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
        "lm_head": lin(h, config.vocab_size, config.lm_head_bias),
    }
    if config.pos_embedding == "learned":
        params["pos_embed"] = arr(config.max_position_embeddings, h)
    if config.embedding_norm:
        params["embed_norm"] = {
            "scale": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)
        }
    return params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="gptj",
                   choices=["gptj", "mpt", "falcon", "gpt_neox", "llama2"])
    p.add_argument("--prompt-len", type=int, default=32)
    p.add_argument("--decode-tokens", type=int, default=32)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--autotune", action="store_true",
                   help="per-shape khalf/w32 layout tuning (ops/op_tuning) "
                        "before timing; table persisted under ~/.cache")
    args = p.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig
    from intel_extension_for_transformers_tpu.models.llama import LlamaConfig
    from intel_extension_for_transformers_tpu.utils.benchmark import (
        BenchmarkConfig,
        benchmark_generation,
    )

    config = {
        "gptj": DecoderConfig.gptj_6b,
        "mpt": DecoderConfig.mpt_7b,
        "falcon": DecoderConfig.falcon_7b,
        "gpt_neox": DecoderConfig.gpt_neox_20b,
        "llama2": LlamaConfig.llama2_7b,
    }[args.arch]()

    rng = np.random.default_rng(0)
    t0 = time.time()
    # group size must divide every half-split K (falcon's 4544 needs 32)
    gs = next(
        g for g in (128, 64, 32)
        if (config.hidden_size // 2) % g == 0
        and (config.intermediate_size // 2) % g == 0
    )
    params = build_params(config, rng, group_size=gs)
    print(f"built int4 {args.arch} params in {time.time()-t0:.0f}s",
          file=sys.stderr)

    if args.autotune:
        from intel_extension_for_transformers_tpu.ops.op_tuning import tune_tree

        t0 = time.time()
        params, table = tune_tree(params, m=args.batch, verbose=True)
        n_w32 = sum(1 for e in table.values() if e["layout"] == "w32")
        print(f"autotuned layouts in {time.time()-t0:.0f}s "
              f"({n_w32}/{len(table)} shapes -> w32)", file=sys.stderr)

    res = benchmark_generation(
        params,
        config,
        BenchmarkConfig(
            batch_size=args.batch,
            seq_len=args.prompt_len,
            iteration=5,
            warmup=1,
            generate_tokens=args.decode_tokens,
        ),
    )
    decode_ms = res["decode"].latency_ms / args.batch
    base = BASELINES_MS[args.arch]
    print(json.dumps({
        "metric": f"{args.arch}_int4_g{gs}_next_token_latency",
        "value": round(decode_ms, 3),
        "unit": "ms",
        "vs_baseline": round(base / decode_ms, 3) if base else None,
        "prefill_ms": round(res["prefill"].latency_ms, 2),
    }))


if __name__ == "__main__":
    main()
