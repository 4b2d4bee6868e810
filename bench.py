"""North-star benchmark: dense retrieval QPS on the local chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.json): flat index over 100k bf16 vectors (BGE-base dim
768), fused similarity + approx top-k (k=10), batch 4096 queries.

Timing methodology: the environment reaches its TPU through a network relay
whose dispatch/transfer latency (~30-180ms per call) would swamp kernel time,
and `block_until_ready` does not reliably block through it. So the benchmark
runs MANY searches inside ONE jitted `lax.fori_loop` (queries generated
on-device from a PRNG seed, which costs ~1% of the search itself) and reads
back a scalar — the wall time is then genuine device compute. Recall@10 is
validated separately against an exact f32 host oracle.
"""

from __future__ import annotations

import json
import time

import numpy as np

N, D, B, K = 100_000, 768, 4096, 10
ITERS = 50


def main() -> None:
    import os

    import jax

    # persistent compilation cache: the first-ever run pays the (remote)
    # compile; every later run of this same program starts in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.retrieval.index import FlatIndex

    rng = np.random.default_rng(0)
    docs = rng.normal(size=(N, D)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)

    idx = FlatIndex(dim=D, dtype="bfloat16", capacity=N)
    idx.add(docs)
    vectors = idx._vectors

    def search(q):
        # oversample with the TPU-native approx top-k, then exact top-K among
        # the 64 candidates: recall@10 ≈ 0.991 at ~355k QPS (measured v5e),
        # vs 0.975 for approx k=10 directly — meets the ≥0.99 north star
        sims = jax.lax.dot_general(
            q, vectors, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        vals, ids = jax.lax.approx_max_k(sims, 64, recall_target=0.95)
        vk, ik = jax.lax.top_k(vals, K)
        return vk, jnp.take_along_axis(ids, ik, axis=1)

    @jax.jit
    def bench_loop(seed):
        def body(i, acc):
            q = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(seed), i), (B, D), jnp.bfloat16
            )
            _, ids = search(q)
            return acc + ids[0, 0] + ids[-1, -1]

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    int(bench_loop(0))  # warmup/compile
    t0 = time.perf_counter()
    int(bench_loop(1))  # scalar readback forces completion
    dt = time.perf_counter() - t0
    qps = B * ITERS / dt

    # recall@10 of the same search program vs exact f32 oracle
    queries = rng.normal(size=(256, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    got = np.asarray(jax.jit(search)(jnp.asarray(queries, jnp.bfloat16))[1])
    oracle = np.argsort(-(queries @ docs.T), axis=1)[:, :K]
    hits = sum(
        len(set(got[i].tolist()) & set(oracle[i].tolist())) for i in range(len(queries))
    )
    recall = hits / oracle.size

    print(
        json.dumps(
            {
                "metric": f"retrieval_qps_flat{N // 1000}k_d{D}_k{K}_recall{recall:.3f}",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / 50_000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
