"""ShardedIVF at 2M coded rows on the 8-device mesh (VERDICT round-3 #8).

Round-2 proved 1M int8-residual rows; round-3's ask is ≥2M coded rows —
250k rows/shard, the per-shard unit of the 100M-on-v5e-8 configuration
(12.5M rows/chip × 8, memory budget recorded in BENCHMARKS.md "IVF at
10M"). Single-core CI note: virtual devices run sequentially and XLA's CPU
collective rendezvous aborts at 40 s, so query batches stay tiny to keep
each collective leg short.
"""

import numpy as np
import pytest

from intel_extension_for_transformers_tpu.parallel import create_mesh
from intel_extension_for_transformers_tpu.retrieval import (
    clustered_embeddings,
    exact_topk,
    recall_at_k,
)
from intel_extension_for_transformers_tpu.retrieval.ivf import ShardedIVFIndex


@pytest.mark.slow
def test_sharded_ivf_two_million_coded_rows():
    N, DIM, NQ = 2_000_000, 128, 16
    docs, queries = clustered_embeddings(N, dim=DIM, n_queries=NQ,
                                         n_topics=64, seed=0)
    mesh = create_mesh(dp=8)
    idx = ShardedIVFIndex(dim=DIM, mesh=mesh, axis="dp", n_lists=512,
                          dtype="int8", list_cap=896)
    idx.train(docs[:100_000], iters=4)
    for i in range(0, N, 100_000):
        idx.add(docs[i:i + 100_000])
    assert idx.size == N

    oracle = exact_topk(docs, queries, 10)
    got = []
    for j in range(0, NQ, 4):
        _, ids = idx.search(queries[j:j + 4], k=10, nprobe=8)
        got.append(np.asarray(ids))
    rec = recall_at_k(np.concatenate(got, 0), oracle)
    # int8 residual codec, 250k rows/shard, 8 of 512 lists probed per shard
    assert float(rec) > 0.9, float(rec)
