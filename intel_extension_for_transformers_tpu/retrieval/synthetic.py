"""Synthetic embedding generators for retrieval-quality evaluation.

Real text-embedding corpora are clustered (topics), hierarchical (subtopics)
and anisotropic (per-dimension variance spread) — none of which a plain
gaussian cloud reproduces. Recall numbers measured on gaussians overstate an
index's quality on real data (the round-1 finding: near-collinear embeddings
break bf16 ranking, examples/text_embedding_mteb.py). These generators give
the harder, more honest distributions the quality tests and `bench.py` pin
recall on.

No reference analogue: ITREX publishes no retrieval recall harness at all
(BASELINE.md "north-star gap"); this module exists so ours is reproducible.
"""

from __future__ import annotations

import numpy as np


def clustered_embeddings(
    n: int,
    dim: int = 768,
    n_queries: int = 256,
    *,
    n_topics: int = 64,
    n_subtopics: int = 16,
    subtopic_scale: float = 0.5,
    noise_scale: float = 0.35,
    anisotropy: float = 0.7,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """→ (docs (n, dim), queries (n_queries, dim)), L2-normalized f32.

    Hierarchical mixture: unit topic centroids, subtopic offsets at
    `subtopic_scale`, log-normal per-dimension anisotropy at exp(N(0, a)).
    With the defaults, within-subtopic cosine ≈ 0.9 and the top-10 boundary
    sits among near-ties — the regime where low-bit encodings actually get
    stressed (median top1 ≈ 0.93, top10 ≈ 0.92 at n=100k).
    """
    rng = np.random.default_rng(seed)
    tops = rng.normal(size=(n_topics, dim)).astype(np.float32)
    tops /= np.linalg.norm(tops, axis=1, keepdims=True)
    subs = rng.normal(size=(n_topics, n_subtopics, dim)).astype(np.float32)
    subs /= np.linalg.norm(subs, axis=2, keepdims=True)
    aniso = np.exp(rng.normal(0, anisotropy, size=(dim,))).astype(np.float32)
    aniso /= np.sqrt((aniso**2).mean())

    def sample(m: int) -> np.ndarray:
        t = rng.integers(0, n_topics, size=m)
        s = rng.integers(0, n_subtopics, size=m)
        x = (
            tops[t]
            + subtopic_scale * subs[t, s]
            + noise_scale
            * rng.normal(size=(m, dim)).astype(np.float32)
            * aniso
            / np.sqrt(dim)
        )
        return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)

    return sample(n), sample(n_queries)


def clustered_embeddings_device(
    n: int,
    dim: int = 768,
    n_queries: int = 256,
    *,
    n_topics: int = 64,
    n_subtopics: int = 16,
    subtopic_scale: float = 0.5,
    noise_scale: float = 0.35,
    anisotropy: float = 0.7,
    seed: int = 0,
):
    """`clustered_embeddings` computed ON the accelerator (jax.random).

    Same hierarchical-mixture distribution (not bit-identical draws — a
    different RNG), returned as device arrays. Exists for the 10M+ scale
    benches: generating 10M×768 f32 on this one-core host costs ~5 min/M
    rows and shipping it through the TPU relay another ~100 s/M rows at the
    measured ~30 MB/s — the device generates the same corpus in seconds and
    nothing crosses the wire (benchmarks/bench_ivf_10m.py).
    """
    import jax
    import jax.numpy as jnp

    kt, ks, ka, kd, kq = jax.random.split(jax.random.PRNGKey(seed), 5)
    tops = jax.random.normal(kt, (n_topics, dim), jnp.float32)
    tops /= jnp.linalg.norm(tops, axis=1, keepdims=True)
    subs = jax.random.normal(ks, (n_topics, n_subtopics, dim), jnp.float32)
    subs /= jnp.linalg.norm(subs, axis=2, keepdims=True)
    aniso = jnp.exp(anisotropy * jax.random.normal(ka, (dim,), jnp.float32))
    aniso /= jnp.sqrt(jnp.mean(aniso**2))

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def sample(key, m):
        k1, k2, k3 = jax.random.split(key, 3)
        t = jax.random.randint(k1, (m,), 0, n_topics)
        s = jax.random.randint(k2, (m,), 0, n_subtopics)
        x = (
            tops[t]
            + subtopic_scale * subs[t, s]
            + noise_scale
            * jax.random.normal(k3, (m, dim), jnp.float32)
            * aniso
            / jnp.sqrt(dim)
        )
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    return sample(kd, n), sample(kq, n_queries)


def gaussian_embeddings(
    n: int, dim: int = 768, n_queries: int = 256, *, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Normalized isotropic gaussian docs/queries (the easy distribution)."""
    rng = np.random.default_rng(seed)
    docs = rng.normal(size=(n, dim)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.normal(size=(n_queries, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return docs, q


def exact_topk(docs: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    """Full-precision exhaustive oracle (the FAISS IndexFlatIP stand-in)."""
    sims = queries.astype(np.float32) @ docs.astype(np.float32).T
    return np.argsort(-sims, axis=1)[:, :k]


def recall_at_k(ids: np.ndarray, oracle: np.ndarray) -> float:
    hits = 0
    for row, orow in zip(ids, oracle):
        hits += len(set(row.tolist()) & set(orow.tolist()))
    return hits / oracle.size
