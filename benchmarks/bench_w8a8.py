"""W8A8 (SmoothQuant int8×int8 MXU) vs bf16 matmul throughput.

Closes the round-1 gap "dynamic-quant act-path perf never benchmarked vs
bf16" (VERDICT.md §2.1 N4). Times a transformer-layer-shaped GEMM stack at
prefill batch sizes: the int8 path quantizes activations on the fly, runs
int8×int8 with int32 accumulation (2× MXU rate class on v5e), and rescales.
Reference contract: the INT8 PTQ throughput gains of docs/release_data.md:49
(1.71-3.83× over fp32 on SPR).

Run: python benchmarks/bench_w8a8.py [--m 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512, help="tokens per step")
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--iters", type=int, default=200)
    args = p.parse_args(argv)

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.quantization.smoothquant import (
        quantize_w8a8,
        w8a8_matmul,
    )

    M, K, N, iters = args.m, args.k, args.n, args.iters
    rng = np.random.default_rng(0)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
    qt = quantize_w8a8(jnp.asarray(w))
    w_bf = jnp.asarray(w, jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)

    def timed(fn):
        @jax.jit
        def loop(x):
            def body(i, acc):
                y = fn(x + acc[0, :1].astype(x.dtype) * 1e-9)
                return y.astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.zeros((M, N), jnp.float32))
        float(loop(x0)[0, 0])
        t0 = time.perf_counter()
        float(loop(x0)[0, 0])
        return (time.perf_counter() - t0) / iters

    t_int8 = timed(lambda x: w8a8_matmul(x, qt))

    def bf16_mm(x):
        return jax.lax.dot(x, w_bf, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16
        )

    t_bf16 = timed(bf16_mm)
    tflops = 2 * M * K * N / 1e12
    print(
        json.dumps(
            {
                "metric": f"w8a8_vs_bf16_matmul_m{M}_k{K}_n{N}",
                "value": round(t_bf16 / t_int8, 3),
                "unit": "speedup_x",
                "vs_baseline": round((t_bf16 / t_int8) / 1.71, 3),
                "int8_ms": round(t_int8 * 1e3, 4),
                "bf16_ms": round(t_bf16 * 1e3, 4),
                "int8_tflops": round(tflops / t_int8, 1),
                "bf16_tflops": round(tflops / t_bf16, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
