"""Per-shape WOQ decode-GEMM bandwidth probe (M=1 serving shapes).

The INT4 decode matmul at M=1 is pure memory traffic: the packed weight
(K*N/2 bytes) must stream from HBM once per token. This probe times each
projection shape of the headline models alone inside one fused loop and
reports effective GB/s against the machine's measured ~310 GB/s streaming
floor — the metric VERDICT r2 tracks for the kernel (reference hot path:
qbits woq_linear, reference: qbits/qbits.cpp:113).

    python benchmarks/bench_woq_shapes.py [--m 1] [--iters 50] [--g 128]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_FLOOR_GBS = 310.0

SHAPES = {
    # name: (K, N, group_size)
    "gptj_qkv": (4096, 4096, 128),
    "gptj_up": (4096, 16384, 128),
    "gptj_down": (16384, 4096, 128),
    "falcon_up": (4544, 18176, 32),
    "falcon_down": (18176, 4544, 32),
    "llama_up": (4096, 11008, 128),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=1)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--shapes", default=None,
                   help="comma list; default = all")
    p.add_argument("--scheme", default="sym", choices=["sym", "asym"])
    p.add_argument("--layout", default="khalf", choices=["khalf", "w32"])
    p.add_argument("--rotate", type=int, default=8,
                   help="weight copies cycled inside the loop so no "
                   "cross-iteration HBM/cache residency can inflate GB/s "
                   "(round-3 VERDICT #5; the chip-characterization probe "
                   "rotates the same way)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from intel_extension_for_transformers_tpu.ops.packing import QuantizedTensor
    from intel_extension_for_transformers_tpu.ops.quant_matmul import woq_matmul

    names = args.shapes.split(",") if args.shapes else list(SHAPES)
    R = max(1, args.rotate)
    results = {}
    for name in names:
        K, N, g = SHAPES[name]
        qts = []
        for r in range(R):
            k1, k2, k3 = jax.random.split(jax.random.PRNGKey(r), 3)
            data = jax.random.randint(k1, (K // 2, N), -128, 128, jnp.int8)
            scales = jax.random.uniform(k2, (K // g, N), jnp.float32,
                                        0.005, 0.025)
            zeros = (jax.random.uniform(k3, (K // g, N), jnp.float32,
                                        -2.0, 2.0)
                     if args.scheme == "asym" else None)
            qt = QuantizedTensor(data=data, scales=scales, zeros=zeros,
                                 weight_dtype="int4", scheme=args.scheme,
                                 group_size=g, K=K, N=N)
            if args.layout == "w32":
                from intel_extension_for_transformers_tpu.ops.packing import (
                    to_decode_layout,
                )

                qt = jax.jit(to_decode_layout)(qt)
            qts.append(qt)
        # R distinct weight copies, every one a separate loop-body operand
        # (NOT a stacked array: a dynamic slice would materialize a temp
        # copy before the kernel call and triple the measured traffic).
        # Each fori_loop iteration streams ALL R copies back-to-back —
        # the working set (R × packed bytes, ≥260 MB) exceeds any on-chip
        # residency, so no iteration can be served by the previous one's
        # weight. Per-matmul time = slope / (iters · R).
        scales0 = qts[0].scales
        zeros0 = qts[0].zeros
        x0 = jax.random.normal(jax.random.PRNGKey(1), (args.m, K), jnp.bfloat16)

        @functools.partial(jax.jit, static_argnums=(2,))
        def loop(x0, qts, iters):
            def body(_, x):
                for qt in qts:
                    out = woq_matmul(x, qt, out_dtype=jnp.bfloat16)
                    # feed a reduction of the output back so no iteration
                    # can be CSE'd/hoisted; the extra work is O(N) per step
                    x = x + jnp.sum(out, axis=-1, keepdims=True) * \
                        jnp.bfloat16(1e-30)
                return x
            return jax.lax.fori_loop(0, iters, body, x0)

        # Differential timing: the relay adds ~30 ms per dispatch, so time two
        # iteration counts and take the slope — pure per-iteration cost.
        lo_it, hi_it = max(1, args.iters // R), max(2, args.iters * 6 // R)
        out = loop(x0, tuple(qts), lo_it)
        float(out[0, 0])  # warmup + compile, scalar readback syncs the relay
        out = loop(x0, tuple(qts), hi_it)
        float(out[0, 0])
        t0 = time.perf_counter()
        out = loop(x0, tuple(qts), lo_it)
        float(out[0, 0])
        t1 = time.perf_counter()
        out = loop(x0, tuple(qts), hi_it)
        float(out[0, 0])
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / ((hi_it - lo_it) * R)
        gbytes = (K * N / 2 + scales0.size * 4
                  + (zeros0.size * 4 if zeros0 is not None else 0)) / 1e9
        gbs = gbytes / dt
        eff = gbs / HBM_FLOOR_GBS
        results[name] = {"us": dt * 1e6, "gbs": gbs, "eff": eff}
        print(f"{name:12s} K={K:5d} N={N:5d} g={g:3d}  "
              f"{dt*1e6:7.1f} us  {gbs:6.1f} GB/s  {eff*100:4.1f}% of floor",
              file=sys.stderr)

    worst = min(results.values(), key=lambda r: r["eff"])
    print(json.dumps({
        "metric": f"woq_m{args.m}_{args.scheme}_{args.layout}_min_shape_efficiency",
        "value": round(worst["eff"] * 100, 1),
        "unit": "% of 310 GB/s",
        "vs_baseline": None,
        "per_shape": {k: round(v["eff"] * 100, 1) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
