"""INT4-encoded vector index tests (the north-star hard part, BASELINE.json:
"INT4-encoded queries must hold recall parity with FP32 at equal index
memory").

Quality is pinned on *clustered, anisotropic* synthetic embeddings
(retrieval/synthetic.py) — the distribution where low-bit encodings actually
get stressed — not the easy gaussian cloud (VERDICT.md round-1 weakness #8).
The exact-f32 numpy oracle plays FAISS IndexFlatIP.
"""

import numpy as np
import pytest

from intel_extension_for_transformers_tpu.retrieval import (
    FlatIndex,
    IVFIndex,
    ShardedFlatIndex,
    ShardedIVFIndex,
    clustered_embeddings,
    exact_topk,
    recall_at_k,
)

DIM, K = 256, 10


@pytest.fixture(scope="module")
def data():
    docs, q = clustered_embeddings(20_000, dim=DIM, n_queries=64, seed=1)
    return docs, q, exact_topk(docs, q, K)


def test_int4_pure_recall_and_memory(data):
    docs, q, oracle = data
    idx = FlatIndex(dim=DIM, dtype="int4", capacity=1024)
    idx.add(docs[:9000])
    idx.add(docs[9000:])  # capacity growth across adds
    assert len(idx) == 20_000
    _, ids = idx.search(q, k=K)
    r = recall_at_k(ids, oracle)
    # pure int4 on hard clustered data: rotation+centering floor
    assert r >= 0.80, r
    # data is exactly ¼ of bf16; group scales (g=64) add 1/64 ≈ 1.6%
    assert idx.memory_ratio_vs_bf16 <= 0.27, idx.memory_ratio_vs_bf16


def test_int4_anchored_beats_plain(data):
    docs, q, oracle = data
    plain = FlatIndex(dim=DIM, dtype="int4", capacity=1024)
    plain.add(docs)
    _, ids_p = plain.search(q, k=K)

    anch = FlatIndex(dim=DIM, dtype="int4", capacity=1024)
    anch.train_anchors(docs[:5000], n_anchors=256)
    anch.add(docs)
    _, ids_a = anch.search(q, k=K)
    r_plain, r_anch = recall_at_k(ids_p, oracle), recall_at_k(ids_a, oracle)
    assert r_anch > r_plain, (r_anch, r_plain)
    assert r_anch >= 0.90, r_anch


def test_int4_rescore_recall_parity_at_lower_memory(data):
    """North-star contract: ≥0.99 recall@10 vs f32 oracle with the int4 scan
    path, at a fraction of the FAISS-flat f32 index memory."""
    docs, q, oracle = data
    idx = FlatIndex(dim=DIM, dtype="int4", rescore_dtype="bfloat16", capacity=1024)
    idx.add(docs)
    for method in ("exact", "approx_rescore"):
        _, ids = idx.search(q, k=K, method=method)
        r = recall_at_k(ids, oracle)
        assert r >= 0.99, (method, r)
    # int4 scan store + bf16 rescore shadow ≤ 0.65× a FAISS-flat f32 index
    assert idx.nbytes <= 0.65 * (4 * DIM * len(idx))


def test_int4_scores_are_true_inner_products(data):
    """Centering/rotation corrections must cancel: returned scores ≈ q·d."""
    docs, q, _ = data
    idx = FlatIndex(dim=DIM, dtype="int4", capacity=1024)
    idx.add(docs[:2000])
    scores, ids = idx.search(q[:8], k=5)
    true = (q[:8] @ docs[:2000].T)[np.arange(8)[:, None], ids]
    np.testing.assert_allclose(scores, true, atol=0.05)


def test_int4_save_load(tmp_path, data):
    docs, q, _ = data
    idx = FlatIndex(dim=DIM, dtype="int4", rescore_dtype="bfloat16", capacity=1024)
    idx.add(docs[:4000])
    idx.save(str(tmp_path))
    idx2 = FlatIndex.load(str(tmp_path))
    s1, i1 = idx.search(q, k=5)
    s2, i2 = idx2.search(q, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-2, atol=1e-3)


def test_int4_anchored_save_load(tmp_path, data):
    docs, q, _ = data
    idx = FlatIndex(dim=DIM, dtype="int4", capacity=1024)
    idx.train_anchors(docs[:3000], n_anchors=64)
    idx.add(docs[:4000])
    idx.save(str(tmp_path))
    idx2 = FlatIndex.load(str(tmp_path))
    _, i1 = idx.search(q, k=5)
    _, i2 = idx2.search(q, k=5)
    np.testing.assert_array_equal(i1, i2)


def test_approx_rescore_public_api(data):
    """The oversample+rescore strategy bench.py measures is a public method
    (VERDICT.md round-1 weakness #2)."""
    docs, q, oracle = data
    idx = FlatIndex(dim=DIM, dtype="bfloat16", capacity=1024)
    idx.add(docs)
    _, ids_a = idx.search(q, k=K, method="approx", recall_target=0.95)
    _, ids_r = idx.search(q, k=K, method="approx_rescore", recall_target=0.95)
    assert recall_at_k(ids_r, oracle) >= recall_at_k(ids_a, oracle)
    assert recall_at_k(ids_r, oracle) >= 0.99


def test_sharded_int4_rescore(mesh8, data):
    docs, q, oracle = data
    sh = ShardedFlatIndex(
        dim=DIM, mesh=mesh8, dtype="int4", rescore_dtype="bfloat16"
    )
    sh.add(docs[:7777])  # not divisible by 8 — pad rows masked by ids
    sh.add(docs[7777:])
    assert len(sh) == 20_000
    _, ids = sh.search(q, k=K, method="approx_rescore")
    assert recall_at_k(ids, oracle) >= 0.99


def test_sharded_device_side_append_and_growth(mesh8):
    """Appends must stay device-side and ids must be insert-ordered across
    many growth cycles (VERDICT.md round-1 weakness #3)."""
    rng = np.random.default_rng(0)
    docs = rng.normal(size=(6000, 64)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    sh = ShardedFlatIndex(dim=64, mesh=mesh8, dtype="float32", initial_capacity=64)
    for i in range(0, 6000, 500):
        ids = sh.add(docs[i : i + 500])
        assert ids[0] == i and ids[-1] == i + 499
    q = docs[:16]  # self-queries: nearest neighbor must be the row itself
    scores, ids = sh.search(q, k=1)
    np.testing.assert_array_equal(ids[:, 0], np.arange(16))
    np.testing.assert_allclose(scores[:, 0], 1.0, atol=1e-5)


@pytest.mark.slow
def test_sharded_million_vector_build(mesh8):
    """1M-vector sharded add+search on the 8-device CPU mesh (VERDICT.md
    next-round item #3 'done' criterion)."""
    rng = np.random.default_rng(0)
    d = 64
    sh = ShardedFlatIndex(dim=d, mesh=mesh8, dtype="bfloat16", initial_capacity=4096)
    batch = 125_000
    for i in range(8):
        x = rng.normal(size=(batch, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        ids = sh.add(x)
        assert ids[0] == i * batch
        if i == 0:
            probe = x[:8].copy()
    assert len(sh) == 1_000_000
    scores, ids = sh.search(probe, k=4)
    np.testing.assert_array_equal(ids[:, 0], np.arange(8))


def test_ivf_incremental_growth_and_recall(data):
    docs, q, oracle = data
    idx = IVFIndex(dim=DIM, n_lists=64, dtype="float32", list_cap=16)
    idx.train(docs[:5000])
    idx.add(docs[:12_000])
    idx.add(docs[12_000:])  # grows skewed lists, never reassigns old rows
    assert len(idx) == 20_000
    _, ids = idx.search(q, k=K, nprobe=16)
    assert recall_at_k(ids, oracle) >= 0.95
    _, ids_all = idx.search(q, k=K, nprobe=64)
    assert recall_at_k(ids_all, oracle) == 1.0  # all probes == exact f32


def test_ivf_save_load(tmp_path, data):
    docs, q, _ = data
    idx = IVFIndex(dim=DIM, n_lists=32, dtype="float32", list_cap=32)
    idx.train(docs[:3000])
    idx.add(docs[:5000])
    idx.save(str(tmp_path))
    idx2 = IVFIndex.load(str(tmp_path))
    _, i1 = idx.search(q, k=5, nprobe=8)
    _, i2 = idx2.search(q, k=5, nprobe=8)
    np.testing.assert_array_equal(i1, i2)


def test_sharded_ivf(mesh8, data):
    docs, q, oracle = data
    siv = ShardedIVFIndex(
        dim=DIM, mesh=mesh8, n_lists=16, dtype="float32", list_cap=16
    )
    siv.train(docs[:5000])
    siv.add(docs[:9999])
    siv.add(docs[9999:])
    assert len(siv) == 20_000
    _, ids = siv.search(q, k=K, nprobe=4)
    assert recall_at_k(ids, oracle) >= 0.95


def test_ivf_residual_codec_error_bound():
    """encode→decode residual error ≤ half a step per group (both widths)."""
    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.retrieval.ivf import (
        _decode_residual,
        _encode_residual,
    )

    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.normal(size=(32, DIM)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(32, DIM)).astype(np.float32))
    true_r = np.asarray(v - c)
    for bits, width in ((4, DIM // 2), (8, DIM)):
        packed, scales = _encode_residual(v, c, 32, bits)
        assert packed.shape == (32, width) and packed.dtype == jnp.int8
        r = np.asarray(_decode_residual(packed, scales, 32, bits), np.float32)
        step = np.repeat(np.asarray(scales, np.float32), 32, axis=1)
        # bf16 scales/values add small relative slack over the half-step bound
        assert (
            np.abs(r - true_r) <= 0.51 * step + 0.01 * np.abs(true_r) + 1e-6
        ).all(), bits


def test_ivf_coded_recall_memory_menu(data):
    """The IVF memory/recall menu on clustered data at the same nprobe:
    int8 residuals hold recall parity with bf16 at ~0.53× the bytes; int4
    trades to ≥0.90 recall at ~0.27×."""
    docs, q, oracle = data
    kw = dict(n_lists=64, list_cap=16)
    idx = {}
    for dt in ("bfloat16", "int8", "int4"):
        ix = IVFIndex(dim=DIM, dtype=dt, group_size=32, **kw)
        ix.train(docs[:5000])
        ix.add(docs)
        idx[dt] = ix

    rec = {}
    for dt, ix in idx.items():
        _, ids = ix.search(q, k=K, nprobe=16)
        rec[dt] = recall_at_k(ids, oracle)
    assert rec["int8"] >= rec["bfloat16"] - 0.01, rec
    assert rec["int4"] >= 0.90, rec

    mb = {dt: ix.memory_bytes() for dt, ix in idx.items()}
    assert mb["int8"] < 0.62 * mb["bfloat16"], mb
    assert mb["int4"] < 0.35 * mb["bfloat16"], mb


def test_ivf_int4_growth_and_save_load(tmp_path, data):
    docs, q, _ = data
    idx = IVFIndex(dim=DIM, n_lists=32, dtype="int4", list_cap=16)
    idx.train(docs[:3000])
    idx.add(docs[:5000])
    idx.add(docs[5000:12_000])  # forces list growth with both arrays
    assert len(idx) == 12_000
    idx.save(str(tmp_path / "ivf4"))
    idx2 = IVFIndex.load(str(tmp_path / "ivf4"))
    s1, i1 = idx.search(q, k=5, nprobe=8)
    s2, i2 = idx2.search(q, k=5, nprobe=8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-3, atol=1e-3)


def test_sharded_ivf_coded(mesh8, data):
    """8-shard coded IVF: device-side residual encode + scatter, bounded
    probes per shard, ICI merge; int8 recall parity with sharded bf16,
    int4 at its documented floor."""
    docs, q, oracle = data
    kw = dict(dim=DIM, mesh=mesh8, n_lists=16, list_cap=16)
    bf = ShardedIVFIndex(dtype="bfloat16", **kw)
    bf.train(docs[:5000])
    bf.add(docs)
    i8 = ShardedIVFIndex(dtype="int8", group_size=32, **kw)
    i8.train(docs[:5000])
    i8.add(docs)
    i4 = ShardedIVFIndex(dtype="int4", group_size=32, **kw)
    i4.train(docs[:5000])
    i4.add(docs[:9999])
    i4.add(docs[9999:])  # growth path with scales
    assert len(i4) == 20_000
    _, ids_bf = bf.search(q, k=K, nprobe=4)
    _, ids_i8 = i8.search(q, k=K, nprobe=4)
    _, ids_i4 = i4.search(q, k=K, nprobe=4)
    r_bf = recall_at_k(ids_bf, oracle)
    assert recall_at_k(ids_i8, oracle) >= r_bf - 0.01
    assert recall_at_k(ids_i4, oracle) >= 0.88
    assert i8.memory_bytes() < 0.62 * bf.memory_bytes()
    assert i4.memory_bytes() < 0.35 * bf.memory_bytes()


def test_fused_scan_topk_candidates():
    """ops/scan_topk.py: per-tile top-2 candidates must contain the true
    top-10 and carry exact (bf16-rounded) scores; masked tails excluded."""
    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.ops.scan_topk import (
        scan_topk_candidates,
    )

    rng = np.random.default_rng(0)
    n, d, b = 8192, 128, 64
    docs = rng.normal(size=(n, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.normal(size=(b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    vals, ids = scan_topk_candidates(
        jnp.asarray(q), jnp.asarray(docs), jnp.int32(n), m=32, n_tile=256
    )
    vals, ids = np.asarray(vals), np.asarray(ids)
    oracle = exact_topk(docs, q, 10)
    contain = np.mean([len(set(ids[i]) & set(oracle[i])) / 10 for i in range(b)])
    assert contain >= 0.99, contain
    true = q @ docs.T
    np.testing.assert_allclose(
        np.take_along_axis(true, ids, 1), vals, atol=5e-3
    )
    # masking: a partially-filled index never returns tail ids
    _, ids2 = scan_topk_candidates(
        jnp.asarray(q), jnp.asarray(docs), jnp.int32(1000), m=8, n_tile=256
    )
    assert int(np.asarray(ids2).max()) < 1000
