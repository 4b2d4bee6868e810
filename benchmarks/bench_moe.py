"""Mixtral-family MoE INT4 decode benchmark: gathered vs dense-all-experts.

Reference coverage: the reference serves Mixtral through neural-speed's
mixtral graph (consumed at modeling/modeling_auto.py:812-827) but publishes
no Mixtral latency; this benchmark pins OUR number and demonstrates the
gathered-expert decode win (models/llama.py _moe_mlp: when M·k < E, only
the selected experts' packed blocks are read — k/E of the expert HBM
traffic per token).

Model: Mixtral-8x7B architecture truncated to --layers decoder layers so
the int4 expert stacks fit one 16 GB chip (8 layers ≈ 5.6 GB of experts).
Weights are random packed bytes generated ON DEVICE — identical compute
and memory traffic to trained weights.

Each variant runs in a SUBPROCESS (dense is forced via the
ITX_MOE_DENSE_DECODE trace-time escape hatch; separate processes keep the
jit caches and HBM footprints isolated).

    python benchmarks/bench_moe.py [--layers 8] [--variant both]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_gptj_int4 import random_qt, _next_key  # noqa: E402


def random_qt_stacked(E, K, N, group_size=128):
    """Stacked (E, K, N) random packed expert weight, generated on device."""
    import jax
    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.ops.packing import QuantizedTensor

    k1, k2 = jax.random.split(_next_key())
    data = jax.random.randint(k1, (E, K // 2, N), -128, 128, jnp.int8)
    scales = jax.random.uniform(
        k2, (E, K // group_size, N), jnp.float32, 0.005, 0.025
    )
    return QuantizedTensor(
        data=data, scales=scales, zeros=None, weight_dtype="int4",
        scheme="sym", group_size=group_size, K=K, N=N,
    )


def build_moe_params(config, group_size=128):
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16
    h, i = config.hidden_size, config.intermediate_size
    hd, nh, nkv = (config.head_dim, config.num_attention_heads,
                   config.num_key_value_heads)
    E = config.num_local_experts

    def arr(*shape, scale=0.02):
        return jax.random.normal(_next_key(), shape, dt) * scale

    layers = []
    for _ in range(config.num_hidden_layers):
        layers.append({
            "input_norm": jnp.ones((h,), dt),
            "attention": {
                "q": {"kernel": random_qt(None, h, nh * hd, group_size)},
                "k": {"kernel": random_qt(None, h, nkv * hd, group_size)},
                "v": {"kernel": random_qt(None, h, nkv * hd, group_size)},
                "o": {"kernel": random_qt(None, nh * hd, h, group_size)},
            },
            "post_norm": jnp.ones((h,), dt),
            "mlp": {
                "router": {"kernel": arr(h, E, scale=0.05)},
                "experts": {
                    "gate": random_qt_stacked(E, h, i, group_size),
                    "up": random_qt_stacked(E, h, i, group_size),
                    "down": random_qt_stacked(E, i, h, group_size),
                },
            },
        })
    return {
        "embed_tokens": arr(config.vocab_size, h),
        "layers": layers,
        "final_norm": jnp.ones((h,), dt),
        "lm_head": {"kernel": random_qt(None, h, config.vocab_size, group_size)},
    }


def run_variant(layers: int) -> dict:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dataclasses import replace

    from intel_extension_for_transformers_tpu.models.llama import LlamaConfig
    from intel_extension_for_transformers_tpu.utils.benchmark import (
        BenchmarkConfig,
        benchmark_generation,
    )

    config = replace(LlamaConfig.mixtral_8x7b(), num_hidden_layers=layers,
                     max_position_embeddings=512)
    t0 = time.time()
    params = build_moe_params(config)
    print(f"built int4 mixtral[{layers}L] in {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)

    res = benchmark_generation(
        params, config,
        BenchmarkConfig(batch_size=1, seq_len=32, iteration=5, warmup=1,
                        generate_tokens=32),
    )
    return {
        "decode_ms": round(res["decode"].latency_ms, 3),
        "prefill_ms": round(res["prefill"].latency_ms, 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--variant", default="both",
                   choices=["both", "gather", "dense"])
    args = p.parse_args()

    if args.variant != "both":
        if args.variant == "dense":
            os.environ["ITX_MOE_DENSE_DECODE"] = "1"
        print(json.dumps(run_variant(args.layers)))
        return

    out = {}
    for variant in ("gather", "dense"):
        # explicit child env: a stray ITX_MOE_DENSE_DECODE in the caller's
        # shell must not silently turn the gather child dense (ADVICE r3)
        env = {k: v for k, v in os.environ.items()
               if k != "ITX_MOE_DENSE_DECODE"}
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--layers", str(args.layers), "--variant", variant],
            capture_output=True, text=True, env=env,
        )
        sys.stderr.write(r.stderr)
        if r.returncode != 0:
            raise SystemExit(f"{variant} run failed rc={r.returncode}")
        out[variant] = json.loads(r.stdout.strip().splitlines()[-1])
        print(f"{variant}: {out[variant]}", file=sys.stderr, flush=True)

    speedup = out["dense"]["decode_ms"] / out["gather"]["decode_ms"]
    print(json.dumps({
        "metric": f"mixtral{args.layers}L_int4_next_token_latency",
        "value": out["gather"]["decode_ms"],
        "unit": "ms",
        "vs_baseline": None,
        "detail": {**out, "gather_speedup_vs_dense": round(speedup, 2)},
    }))


if __name__ == "__main__":
    main()
