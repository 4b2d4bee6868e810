"""Retrieval engine tests: flat/int8/sharded/IVF indexes vs exact oracle,
splitter, parser, BM25.

The exact-numpy oracle plays the role FAISS IndexFlatIP plays in the north
star (BASELINE.json): recall is measured against full-precision exhaustive
search.
"""

import json
import os

import numpy as np
import pytest

from intel_extension_for_transformers_tpu.retrieval import (
    BM25Retriever,
    DocumentParser,
    FlatIndex,
    IVFIndex,
    RecursiveCharacterTextSplitter,
    ShardedFlatIndex,
)


def _data(n=2000, d=64, nq=32, seed=0):
    rng = np.random.default_rng(seed)
    docs = rng.normal(size=(n, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.normal(size=(nq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return docs, q


def _oracle_topk(docs, q, k):
    sims = q @ docs.T
    return np.argsort(-sims, axis=1)[:, :k]


def _recall(ids, oracle):
    hits = 0
    for row, orow in zip(ids, oracle):
        hits += len(set(row.tolist()) & set(orow.tolist()))
    return hits / oracle.size


def test_flat_index_exact_matches_oracle():
    docs, q = _data()
    idx = FlatIndex(dim=64, dtype="float32")
    ids = idx.add(docs)
    assert len(idx) == 2000 and ids[-1] == 1999
    scores, got = idx.search(q, k=10)
    oracle = _oracle_topk(docs, q, 10)
    assert _recall(got, oracle) == 1.0
    # scores sorted descending
    assert np.all(np.diff(scores, axis=1) <= 1e-6)


def test_flat_index_bf16_recall():
    docs, q = _data()
    idx = FlatIndex(dim=64, dtype="bfloat16")
    idx.add(docs)
    _, got = idx.search(q, k=10)
    assert _recall(got, _oracle_topk(docs, q, 10)) >= 0.97


def test_flat_index_int8_recall():
    docs, q = _data()
    idx = FlatIndex(dim=64, dtype="int8")
    idx.add(docs)
    _, got = idx.search(q, k=10)
    assert _recall(got, _oracle_topk(docs, q, 10)) >= 0.95


def test_flat_index_incremental_add_and_growth():
    docs, q = _data(n=600)
    idx = FlatIndex(dim=64, dtype="float32", capacity=64)
    for i in range(0, 600, 100):
        idx.add(docs[i : i + 100])
    assert len(idx) == 600
    _, got = idx.search(q[:4], k=5)
    assert _recall(got, _oracle_topk(docs, q[:4], 5)) == 1.0


def test_flat_index_single_query_and_cosine():
    docs, q = _data()
    idx = FlatIndex(dim=64, dtype="float32", metric="cosine")
    idx.add(docs * 3.7)  # arbitrary norms; cosine must normalize
    scores, got = idx.search(q[0], k=7)
    assert got.shape == (7,)
    oracle = _oracle_topk(docs, q[:1], 7)
    assert _recall(got[None], oracle) == 1.0


def test_flat_index_save_load(tmp_path):
    docs, q = _data(n=500)
    idx = FlatIndex(dim=64, dtype="int8")
    idx.add(docs)
    idx.save(str(tmp_path))
    idx2 = FlatIndex.load(str(tmp_path))
    s1, i1 = idx.search(q, k=5)
    s2, i2 = idx2.search(q, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_flat_index_empty_raises():
    idx = FlatIndex(dim=16)
    with pytest.raises(ValueError):
        idx.search(np.zeros((1, 16), np.float32), k=1)


def test_sharded_index_matches_flat(mesh8):
    docs, q = _data(n=1111)  # deliberately not divisible by 8
    sharded = ShardedFlatIndex(dim=64, mesh=mesh8, axis="dp", dtype="float32")
    sharded.add(docs)
    _, got = sharded.search(q, k=10)
    oracle = _oracle_topk(docs, q, 10)
    assert _recall(got, oracle) == 1.0


def test_sharded_index_int8(mesh8):
    docs, q = _data(n=1024)
    sharded = ShardedFlatIndex(dim=64, mesh=mesh8, axis="dp", dtype="int8")
    sharded.add(docs)
    _, got = sharded.search(q, k=10)
    assert _recall(got, _oracle_topk(docs, q, 10)) >= 0.95


def test_ivf_index_recall():
    docs, q = _data(n=4000)
    idx = IVFIndex(dim=64, n_lists=32, dtype="float32")
    idx.train(docs[:2000])
    idx.add(docs)
    _, got = idx.search(q, k=10, nprobe=8)
    oracle = _oracle_topk(docs, q, 10)
    # IVF with 8/32 probes on unstructured data: recall well above random
    assert _recall(got, oracle) >= 0.6
    _, got_all = idx.search(q, k=10, nprobe=32)
    assert _recall(got_all, oracle) == 1.0  # all probes == exact


# --------------------------- text utilities ---------------------------


def test_splitter_chunks_and_overlap():
    sp = RecursiveCharacterTextSplitter(chunk_size=100, chunk_overlap=20)
    text = " ".join(f"word{i}" for i in range(200))
    chunks = sp.split_text(text)
    assert len(chunks) > 3
    assert all(len(c) <= 120 for c in chunks)  # size + carried overlap


def test_splitter_documents_metadata():
    sp = RecursiveCharacterTextSplitter(chunk_size=50, chunk_overlap=0)
    docs = [{"content": "a" * 120, "metadata": {"source": "x"}}]
    out = sp.split_documents(docs)
    assert len(out) >= 2
    assert out[0]["metadata"]["source"] == "x"
    assert out[1]["metadata"]["chunk"] == 1


def test_parser_formats(tmp_path):
    (tmp_path / "a.txt").write_text("hello tpu world. " * 50)
    (tmp_path / "b.md").write_text("# Title\n\nSome content here. " * 30)
    (tmp_path / "c.jsonl").write_text(
        "\n".join(json.dumps({"content": f"doc {i}", "id": i}) for i in range(3))
    )
    (tmp_path / "d.html").write_text(
        "<html><script>x=1</script><body><p>visible text</p></body></html>"
    )
    (tmp_path / "e.csv").write_text("question,answer\nWhat is TPU?,A tensor processor\n")

    p = DocumentParser(chunk_size=200, chunk_overlap=10)
    docs = p.load(str(tmp_path))
    contents = " ".join(d["content"] for d in docs)
    assert "hello tpu world" in contents
    assert "Some content here" in contents
    assert "doc 1" in contents
    assert "visible text" in contents and "x=1" not in contents
    assert "What is TPU?" in contents
    assert all("source" in d["metadata"] for d in docs)


def test_parser_unsupported_format(tmp_path):
    f = tmp_path / "x.bin"
    f.write_bytes(b"\x00\x01")
    p = DocumentParser()
    with pytest.raises(ValueError):
        p.load_file(str(f))


def test_bm25_ranking():
    docs = [
        {"content": "the quick brown fox jumps over the lazy dog", "metadata": {}},
        {"content": "tensor processing units accelerate machine learning", "metadata": {}},
        {"content": "quantization reduces model memory footprint", "metadata": {}},
    ]
    r = BM25Retriever.from_documents(docs)
    out = r.get_relevant_documents("tensor machine learning", k=2)
    assert out[0]["content"].startswith("tensor processing")


def test_ivf_spill_mode_bounded_memory():
    """Capacity-bounded IVF: lists never grow; overflow rows spill to their
    second-nearest centroid and stay findable; doubly-overflowing rows are
    counted as dropped. The 10M+ single-chip build path (no re-layout HBM
    spike)."""
    import jax
    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.retrieval import (
        IVFIndex,
        clustered_embeddings,
        exact_topk,
        recall_at_k,
    )

    n, dim = 6000, 64
    docs, queries = clustered_embeddings(n, dim=dim, n_queries=32,
                                         n_topics=16, seed=3)
    cap = int(1.5 * n / 64)
    idx = IVFIndex(dim=dim, n_lists=64, dtype="bfloat16", list_cap=cap,
                   spill=True)
    # bounded-memory recipe: tight k-means balancing + the spill cascade
    idx.train(docs[:2000], iters=5, balance_ratio=1.3, balance_rounds=8)
    for i in range(0, n, 1000):
        idx.add(docs[i:i + 1000])
    # capacity is a hard bound: storage never re-laid out
    assert idx._storage.shape[0] == 64 * cap
    assert int(jnp.max(idx._fill)) <= cap
    # spilled rows remain findable via multi-probe; drops are rare
    assert idx.dropped < n * 0.02, idx.dropped
    stored = int(jnp.sum(idx._row_ids >= 0))
    assert stored == n - idx.dropped
    oracle = exact_topk(docs, queries, 10)
    _, ids = idx.search(queries, k=10, nprobe=16)
    rec = recall_at_k(np.asarray(ids), oracle)
    assert float(rec) > 0.85, float(rec)


def test_constrained_kmeans_balances_lists():
    """Constrained-assignment quantizer (COVERAGE.md gap #1): training with
    capacity-constrained Lloyd yields near-equal-mass regions, so
    nearest-centroid inserts stay balanced by construction — the
    exact-memory option for 100M-scale builds. Compares list skew and
    recall against the plain quantizer on clustered (skew-inducing) data."""
    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.retrieval import (
        IVFIndex,
        clustered_embeddings,
        exact_topk,
        recall_at_k,
    )
    from intel_extension_for_transformers_tpu.retrieval._kmeans import (
        _assign_constrained,
    )

    n, dim, C = 6000, 64, 64
    docs, queries = clustered_embeddings(n, dim=dim, n_queries=32,
                                         n_topics=8, seed=5)

    # the assignment primitive: caps are a hard bound, nothing dropped
    x = jnp.asarray(docs[:2000], jnp.float32)
    cent = jnp.asarray(docs[:C], jnp.float32)
    cap = int(1.1 * 2000 / C) + 1
    a = np.asarray(_assign_constrained(x, cent, cap, C))
    counts = np.bincount(a, minlength=C)
    assert counts.max() <= cap and counts.sum() == 2000

    def build(**train_kw):
        idx = IVFIndex(dim=dim, n_lists=C, dtype="float32")
        idx.train(docs[:3000], iters=6, **train_kw)
        idx.add(docs)
        fill = np.asarray(idx._fill, np.int64)
        return idx, fill.max() / max(1.0, fill.mean())

    plain, plain_skew = build(balance_rounds=0)
    bal, bal_skew = build(constrained=True)
    # topic-clustered data skews plain Lloyd hard; constrained training
    # must bound the max list near the mean
    assert bal_skew < plain_skew, (bal_skew, plain_skew)
    assert bal_skew <= 3.0, bal_skew

    oracle = exact_topk(docs, queries, 10)
    _, ids = bal.search(queries, k=10, nprobe=16)
    _, ids_p = plain.search(queries, k=10, nprobe=16)
    rec, rec_p = (float(recall_at_k(np.asarray(i), oracle))
                  for i in (ids, ids_p))
    # equal-mass lists cost little recall at equal nprobe
    assert rec >= rec_p - 0.05, (rec, rec_p)
    assert rec >= 0.85, rec


def test_hierarchical_kmeans_balances_lumpy_mass():
    """Two-level mass-proportional quantizer (round-3 VERDICT #2 support):
    on lumpy multi-modal data, flat Lloyd leaves a heavy list-mass tail
    that caps IVF recall at 10M scale; the hierarchical quantizer's
    mass-proportional level-2 budgets bound max/mean skew near 1 and an
    IVFIndex trained with hierarchical=... keeps recall on clustered
    data."""
    from intel_extension_for_transformers_tpu.retrieval import (
        IVFIndex,
        clustered_embeddings,
        exact_topk,
        recall_at_k,
    )
    from intel_extension_for_transformers_tpu.retrieval._kmeans import (
        kmeans_hierarchical,
        _nearest_centroid,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # deliberately lumpy: two modes with 3:1 mass
    x = np.concatenate([
        rng.normal(0.0, 0.1, (3000, 32)),
        rng.normal(3.0, 0.1, (1000, 32)),
    ]).astype(np.float32)
    cent = kmeans_hierarchical(x, 64, l1=8, iters=5, seed=0)
    assert cent.shape == (64, 32)
    a = np.asarray(_nearest_centroid(jnp.asarray(x), cent))
    counts = np.bincount(a, minlength=64)
    assert counts.max() / counts.mean() < 2.0, counts.max() / counts.mean()
    assert (counts == 0).sum() == 0

    # end-to-end through IVFIndex.train(**kmeans_kw) routing
    docs, queries = clustered_embeddings(6000, dim=64, n_queries=32,
                                         n_topics=8, seed=5)
    idx = IVFIndex(dim=64, n_lists=64, dtype="int8", list_cap=256)
    idx.train(docs[:3000], iters=5, hierarchical=8)
    idx.add(docs)
    oracle = exact_topk(docs, queries, 10)
    _, ids = idx.search(queries, k=10, nprobe=16)
    rec = recall_at_k(np.asarray(ids), oracle)
    assert float(rec) > 0.85, float(rec)
