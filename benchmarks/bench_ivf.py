"""IVF bounded-probe search benchmark: QPS + recall per storage codec.

The scale configuration of the driver's BASELINE.json configs[3] ("IVF
coarse-quantize + flat rescore", 100M vectors on v5e-8) measured per chip:
N vectors in C lists, nprobe probes → each query scans nprobe·L rows
instead of N. Reports QPS and recall@10 vs the exact f32 oracle for the
storage menu (bf16 raw rows / int8 residuals / int4 residuals).

    python benchmarks/bench_ivf.py [--n 1000000] [--dim 768] [--nprobe 32]
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
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--n-lists", type=int, default=4096)
    p.add_argument("--nprobe", type=int, default=32)
    # the bounded gather materializes (B, nprobe·L, D) candidates — size the
    # batch so that stays ≲2 GB (B=128, L≈500, D=768 bf16 ≈ 2.4 GB)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtypes", nargs="+",
                   default=["bfloat16", "int8", "int4"])
    p.add_argument("--single", action="store_true",
                   help="internal: run exactly one dtype in-process")
    args = p.parse_args()

    if not args.single and len(args.dtypes) > 1:
        # one dtype per SUBPROCESS: the relay frees HBM only at process
        # exit reliably, and a leftover bf16 index plus int8 decode
        # temporaries overflow the 16 GB chip
        import subprocess

        results = {}
        for dt in args.dtypes:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--single", "--dtypes", dt]
            for k in ("n", "dim", "n_lists", "nprobe", "batch", "iters"):
                cmd += [f"--{k.replace('_', '-')}", str(getattr(args, k))]
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=3600)
            sys.stderr.write(r.stderr[-2000:])
            if r.returncode == 0 and r.stdout.strip():
                out = json.loads(r.stdout.strip().splitlines()[-1])
                results[dt] = out["detail"][dt]
        best = results.get("int8") or next(iter(results.values()))
        print(json.dumps({
            "metric": f"ivf_qps_n{args.n}_d{args.dim}_nprobe{args.nprobe}",
            "value": best["qps"],
            "unit": "qps",
            "detail": results,
        }))
        return

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from intel_extension_for_transformers_tpu.retrieval import (
        IVFIndex,
        clustered_embeddings,
        exact_topk,
        recall_at_k,
    )
    from intel_extension_for_transformers_tpu.retrieval.ivf import (
        _ivf_search,
        _ivf_search_coded,
    )

    print(f"generating {args.n:,} clustered vectors (dim {args.dim})...",
          file=sys.stderr)
    docs, queries = clustered_embeddings(
        args.n, dim=args.dim, n_queries=args.batch,
        n_topics=256, seed=0,
    )
    oracle = exact_topk(docs, queries[:256], 10)

    results = {}
    for dt in args.dtypes:
        idx = IVFIndex(
            dim=args.dim, n_lists=args.n_lists, dtype=dt,
            list_cap=max(16, 2 * args.n // args.n_lists), group_size=32,
        )
        t0 = time.time()
        idx.train(docs[:200_000], iters=6)
        for i in range(0, args.n, 100_000):
            idx.add(docs[i : i + 100_000])
        build_s = time.time() - t0

        _, ids = idx.search(queries[:256], k=10, nprobe=args.nprobe)
        rec = recall_at_k(ids, oracle)

        # fused-loop timing (CLAUDE.md: scalar readback, ≥many iters; index
        # arrays must be ARGUMENTS — a jit closure would ship them as
        # captured constants in the relay's compile request)
        q = jnp.asarray(queries)
        kwargs = dict(k=10, nprobe=args.nprobe, list_cap=idx._list_cap)
        coded = dt in ("int4", "int8")

        @jax.jit
        def loop(qq, cent, storage, scales, row_ids):
            def body(i, acc):
                qi = qq + 0 * i.astype(qq.dtype)
                if coded:
                    _, ii = _ivf_search_coded(
                        qi, cent, storage, scales, row_ids,
                        group_size=idx.group_size, bits=idx._bits, **kwargs,
                    )
                else:
                    _, ii = _ivf_search(qi, cent, storage, row_ids, **kwargs)
                return acc + ii[0, 0]
            return jax.lax.fori_loop(0, args.iters, body, jnp.int32(0))

        operands = (q, idx.centroids, idx._storage,
                    idx._scales if coded else jnp.zeros((1, 1), jnp.bfloat16),
                    idx._row_ids)
        int(loop(*operands))  # compile + warm
        t0 = time.perf_counter()
        int(loop(*operands))  # scalar readback forces completion via relay
        dt_s = time.perf_counter() - t0
        qps = args.batch * args.iters / dt_s
        results[dt] = {
            "qps": round(qps), "recall@10": round(float(rec), 4),
            "memory_mb": round(idx.memory_bytes() / 1e6, 1),
            "build_s": round(build_s, 1),
        }
        print(f"{dt}: {results[dt]}", file=sys.stderr)
        del idx, operands  # drop HBM refs before the next dtype builds
        import gc

        gc.collect()

    best = results.get("int8") or next(iter(results.values()))
    print(json.dumps({
        "metric": f"ivf_qps_n{args.n}_d{args.dim}_nprobe{args.nprobe}",
        "value": best["qps"],
        "unit": "qps",
        "detail": results,
    }))


if __name__ == "__main__":
    main()
