"""On-HBM dense vector indexes with fused similarity + top-k query kernels.

The TPU-native replacement for the reference's vector-store layer — chromadb /
qdrant wrappers (reference: langchain_community/vectorstores/chroma.py:50-238)
whose hot loops (vector insert, QKᵀ similarity + top-k) ran inside a CPU
library. Here the index IS a device array:

- `FlatIndex` — exact search. Vectors live in HBM as f32/bf16 or int8 with
  per-vector scales (asymmetric scoring: int8 docs × bf16 queries on the MXU,
  then a per-doc scale multiply on the VPU — recall-neutral at ~4× memory
  saving). Top-k via `jax.lax.top_k` (exact) or `jax.lax.approx_max_k`
  (TPU's hardware-friendly bitonic approx top-k with a recall target —
  the idiomatic fused "similarity+topk" on this architecture).
- `ShardedFlatIndex` — rows sharded over a mesh axis with shard_map;
  per-device partial top-k then a gather-merge, so query cost rides ICI not
  HBM (the north-star distributed design: per-chip partial top-k + merge).
- `IVFIndex` — k-means coarse quantizer + inverted lists, searched by probing
  `nprobe` centroids with batched gather + rescoring; trades exactness for
  sub-linear scan at very large N.

All indexes support add/search/save/load (persistence parity with the
reference's Chroma persist_directory flow, retrieval_agent.py:211-231).
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _l2_normalize(x, eps=1e-12):
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


def _encode_int8(vectors: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-vector symmetric int8 encode: v ≈ scale * q."""
    v = vectors.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(v / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0]


@partial(jax.jit, static_argnames=("k", "method", "recall_target"))
def _score_and_topk(
    queries: jax.Array,  # (B, D)
    vectors: jax.Array,  # (N, D) float or int8
    scales: Optional[jax.Array],  # (N,) if int8
    valid: jax.Array,  # (N,) bool — masks unfilled capacity
    k: int,
    method: str = "exact",
    recall_target: float = 0.99,
):
    if scales is not None:
        # int8 docs × bf16 queries: MXU-friendly mixed matmul, then VPU scale
        sims = jax.lax.dot_general(
            queries.astype(jnp.bfloat16),
            vectors,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sims = sims * scales[None, :].astype(jnp.float32)
    else:
        # match query precision to index precision: exact f32 stays f32
        exact_f32 = vectors.dtype == jnp.float32
        sims = jax.lax.dot_general(
            queries.astype(vectors.dtype),
            vectors,
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST
            if exact_f32
            else jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
    sims = jnp.where(valid[None, :], sims, -jnp.inf)
    if method == "approx":
        return jax.lax.approx_max_k(sims, k, recall_target=recall_target)
    return jax.lax.top_k(sims, k)


class FlatIndex:
    """Exact on-HBM flat index (inner-product / cosine).

    Capacity-doubling preallocated storage keeps `add` from re-jitting:
    XLA programs are specialized on the static capacity, which only changes
    O(log N) times over an index build.
    """

    def __init__(
        self,
        dim: int,
        dtype: str = "bfloat16",  # "float32" | "bfloat16" | "int8"
        metric: str = "ip",  # "ip" | "cosine"
        capacity: int = 4096,
    ):
        if dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"unsupported index dtype {dtype}")
        if metric not in ("ip", "cosine"):
            raise ValueError(f"unsupported metric {metric}")
        self.dim = dim
        self.dtype = dtype
        self.metric = metric
        self.size = 0
        self._capacity = max(int(capacity), 8)
        store_dtype = jnp.int8 if dtype == "int8" else jnp.dtype(dtype)
        self._vectors = jnp.zeros((self._capacity, dim), store_dtype)
        self._scales = (
            jnp.zeros((self._capacity,), jnp.float32) if dtype == "int8" else None
        )

    def __len__(self) -> int:
        return self.size

    def _grow(self, need: int) -> None:
        new_cap = self._capacity
        while new_cap < need:
            new_cap *= 2
        if new_cap == self._capacity:
            return
        pad = new_cap - self._capacity
        self._vectors = jnp.concatenate(
            [self._vectors, jnp.zeros((pad, self.dim), self._vectors.dtype)]
        )
        if self._scales is not None:
            self._scales = jnp.concatenate([self._scales, jnp.zeros((pad,), jnp.float32)])
        self._capacity = new_cap

    def add(self, vectors) -> np.ndarray:
        """Insert (M, D) vectors; returns their assigned ids."""
        vectors = jnp.asarray(vectors)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected (M, {self.dim}) vectors, got {vectors.shape}")
        M = vectors.shape[0]
        if self.metric == "cosine":
            vectors = _l2_normalize(vectors)
        self._grow(self.size + M)
        if self.dtype == "int8":
            q, s = _encode_int8(vectors)
            self._vectors = jax.lax.dynamic_update_slice(
                self._vectors, q, (self.size, 0)
            )
            self._scales = jax.lax.dynamic_update_slice(self._scales, s, (self.size,))
        else:
            self._vectors = jax.lax.dynamic_update_slice(
                self._vectors, vectors.astype(self._vectors.dtype), (self.size, 0)
            )
        ids = np.arange(self.size, self.size + M)
        self.size += M
        return ids

    def search(
        self,
        queries,
        k: int = 10,
        method: str = "exact",
        recall_target: float = 0.99,
    ) -> tuple[np.ndarray, np.ndarray]:
        """→ (scores (B, k), ids (B, k)). method: exact | approx."""
        if self.size == 0:
            raise ValueError("index is empty")
        queries = jnp.asarray(queries)
        squeeze = queries.ndim == 1
        if squeeze:
            queries = queries[None, :]
        if self.metric == "cosine":
            queries = _l2_normalize(queries)
        k = min(k, self.size)
        valid = jnp.arange(self._capacity) < self.size
        scores, ids = _score_and_topk(
            queries,
            self._vectors,
            self._scales,
            valid,
            k=k,
            method=method,
            recall_target=recall_target,
        )
        scores, ids = np.asarray(scores), np.asarray(ids)
        if squeeze:
            return scores[0], ids[0]
        return scores, ids

    # -- persistence (reference: Chroma persist/reload, chroma.py:118-238) --
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        vec = self._vectors[: self.size]
        if vec.dtype == jnp.bfloat16:  # numpy has no bf16; store f32
            vec = vec.astype(jnp.float32)
        arrays = {"vectors": np.asarray(vec)}
        if self._scales is not None:
            arrays["scales"] = np.asarray(self._scales[: self.size])
        np.savez(os.path.join(path, "index.npz"), **arrays)
        with open(os.path.join(path, "index.json"), "w") as f:
            json.dump(
                {
                    "type": "flat",
                    "dim": self.dim,
                    "dtype": self.dtype,
                    "metric": self.metric,
                    "size": self.size,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "FlatIndex":
        with open(os.path.join(path, "index.json")) as f:
            meta = json.load(f)
        npz = np.load(os.path.join(path, "index.npz"))
        idx = cls(meta["dim"], meta["dtype"], meta["metric"], capacity=max(meta["size"], 8))
        n = meta["size"]
        idx._vectors = jax.lax.dynamic_update_slice(
            idx._vectors,
            jnp.asarray(npz["vectors"]).astype(idx._vectors.dtype),
            (0, 0),
        )
        if idx._scales is not None and "scales" in npz:
            idx._scales = jax.lax.dynamic_update_slice(
                idx._scales, jnp.asarray(npz["scales"]), (0,)
            )
        idx.size = n
        return idx


class ShardedFlatIndex:
    """Flat index with rows sharded across a mesh axis.

    Query plan (north-star design, SURVEY.md §2.3): queries replicate to all
    devices; each device scans its row shard and keeps a local top-k; the
    k-per-shard candidates all-gather over ICI and the final top-k runs
    replicated — O(N/P) HBM traffic per chip, O(k·P) interconnect bytes.
    """

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        axis: str = "dp",
        dtype: str = "bfloat16",
        metric: str = "ip",
    ):
        self.dim = dim
        self.mesh = mesh
        self.axis = axis
        self.dtype = dtype
        self.metric = metric
        self.n_shards = mesh.shape[axis]
        self.size = 0
        self._capacity = 0
        self._vectors = None  # (P * cap_per_shard, D) sharded on axis 0
        self._scales = None
        self._sharding = NamedSharding(mesh, P(axis, None))
        self._scale_sharding = NamedSharding(mesh, P(axis))
        self._repl = NamedSharding(mesh, P())

    def __len__(self):
        return self.size

    def add(self, vectors) -> np.ndarray:
        """Bulk insert. Rows are round-robin'd into shards by re-layout: we
        simply append and re-device_put; ids are positions in insert order."""
        vectors = jnp.asarray(vectors)
        if self.metric == "cosine":
            vectors = _l2_normalize(vectors)
        host_new = np.asarray(vectors, dtype=np.float32)
        if self._vectors is None:
            host = host_new
        else:
            host = np.concatenate(
                [np.asarray(self._host_valid(), np.float32), host_new]
            )
        ids = np.arange(self.size, self.size + host_new.shape[0])
        self.size = host.shape[0]
        # pad to multiple of n_shards for even sharding
        P_ = self.n_shards
        cap = -(-self.size // P_) * P_
        pad = cap - self.size
        if pad:
            host = np.concatenate([host, np.zeros((pad, self.dim), np.float32)])
        self._capacity = cap
        if self.dtype == "int8":
            q, s = _encode_int8(jnp.asarray(host))
            self._vectors = jax.device_put(q, self._sharding)
            self._scales = jax.device_put(s, self._scale_sharding)
        else:
            self._vectors = jax.device_put(
                jnp.asarray(host, jnp.dtype(self.dtype)), self._sharding
            )
        return ids

    def _host_valid(self):
        if self.dtype == "int8":
            v = np.asarray(self._vectors[: self.size], np.float32)
            return v * np.asarray(self._scales[: self.size])[:, None]
        return self._vectors[: self.size]

    def search(self, queries, k: int = 10, method: str = "exact"):
        if self.size == 0:
            raise ValueError("index is empty")
        queries = jnp.asarray(queries)
        squeeze = queries.ndim == 1
        if squeeze:
            queries = queries[None, :]
        if self.metric == "cosine":
            queries = _l2_normalize(queries)
        k = min(k, self.size)
        queries = jax.device_put(queries, self._repl)
        has_scales = self._scales is not None
        scales = (
            self._scales
            if has_scales
            else jax.device_put(
                jnp.ones((self._capacity,), jnp.float32), self._scale_sharding
            )
        )
        scores, ids = _sharded_search(
            queries,
            self._vectors,
            scales,
            jnp.int32(self.size),
            mesh=self.mesh,
            axis=self.axis,
            k=k,
            method=method,
            has_scales=has_scales,
        )
        scores, ids = np.asarray(scores), np.asarray(ids)
        if squeeze:
            return scores[0], ids[0]
        return scores, ids


@partial(jax.jit, static_argnames=("mesh", "axis", "k", "method", "has_scales"))
def _sharded_search(
    queries, vectors, scales, size, *, mesh, axis, k, method, has_scales
):
    from jax import shard_map

    cap = vectors.shape[0]
    per_shard = cap // mesh.shape[axis]

    def shard_fn(q, v, s):
        shard_idx = jax.lax.axis_index(axis)
        row0 = shard_idx * per_shard
        local_ids = row0 + jnp.arange(per_shard)
        valid = local_ids < size
        scores, loc = _score_and_topk(
            q, v, s if has_scales else None, valid, k=k, method=method
        )
        gids = jnp.take(local_ids, loc)  # (B, k) global ids
        # gather all shards' candidates over ICI and merge (replicated)
        all_scores = jax.lax.all_gather(scores, axis, axis=1)  # (B, P, k)
        all_ids = jax.lax.all_gather(gids, axis, axis=1)
        B = q.shape[0]
        best, pos = jax.lax.top_k(all_scores.reshape(B, -1), k)
        return best, jnp.take_along_axis(all_ids.reshape(B, -1), pos, axis=1)

    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, vectors, scales)


class IVFIndex:
    """IVF: k-means coarse centroids + nprobe scan with exact rescoring.

    The "IVF coarse-quantize + flat rescore" configuration from the driver's
    benchmark list (BASELINE.json configs[3]). TPU formulation: centroids and
    vectors stay as dense arrays; a probe gathers candidate rows with
    jnp.take (XLA dynamic-gather) and rescores exactly — data-dependent list
    lengths are padded to the max list size to keep shapes static.
    """

    def __init__(
        self,
        dim: int,
        n_lists: int = 64,
        metric: str = "ip",
        dtype: str = "bfloat16",
    ):
        self.dim = dim
        self.n_lists = n_lists
        self.metric = metric
        self.dtype = dtype
        self.centroids: Optional[jax.Array] = None  # (C, D)
        self._vectors: Optional[jax.Array] = None  # (N, D) insert order
        self._list_ids: Optional[jax.Array] = None  # (C, L) padded row ids
        self._list_len: Optional[jax.Array] = None  # (C,)
        self.size = 0

    def train(self, sample, iters: int = 10, seed: int = 0) -> None:
        """k-means on a sample (host-side loop, device-side distance steps)."""
        x = jnp.asarray(sample, jnp.float32)
        if self.metric == "cosine":
            x = _l2_normalize(x)
        n = x.shape[0]
        C = min(self.n_lists, n)
        rng = np.random.default_rng(seed)
        cent = x[jnp.asarray(rng.choice(n, C, replace=False))]
        for _ in range(iters):
            assign = _nearest_centroid(x, cent)
            cent = _update_centroids(x, assign, C, cent)
        self.n_lists = C
        self.centroids = cent

    def add(self, vectors) -> np.ndarray:
        if self.centroids is None:
            raise ValueError("IVFIndex.train must be called before add")
        v = jnp.asarray(vectors, jnp.float32)
        if self.metric == "cosine":
            v = _l2_normalize(v)
        ids = np.arange(self.size, self.size + v.shape[0])
        self._vectors = (
            v if self._vectors is None else jnp.concatenate([self._vectors, v])
        )
        self.size = self._vectors.shape[0]
        self._rebuild_lists()
        return ids

    def _rebuild_lists(self):
        assign = np.asarray(_nearest_centroid(self._vectors, self.centroids))
        C = self.n_lists
        lists = [np.where(assign == c)[0] for c in range(C)]
        L = max(1, max(len(l) for l in lists))
        padded = np.full((C, L), -1, np.int32)
        lens = np.zeros((C,), np.int32)
        for c, l in enumerate(lists):
            padded[c, : len(l)] = l
            lens[c] = len(l)
        self._list_ids = jnp.asarray(padded)
        self._list_len = jnp.asarray(lens)

    def search(self, queries, k: int = 10, nprobe: int = 8):
        if self.size == 0:
            raise ValueError("index is empty")
        q = jnp.asarray(queries, jnp.float32)
        squeeze = q.ndim == 1
        if squeeze:
            q = q[None, :]
        if self.metric == "cosine":
            q = _l2_normalize(q)
        nprobe = min(nprobe, self.n_lists)
        k = min(k, self.size)
        scores, ids = _ivf_search(
            q,
            self.centroids,
            self._vectors.astype(jnp.dtype(self.dtype)),
            self._list_ids,
            self._list_len,
            k=k,
            nprobe=nprobe,
        )
        scores, ids = np.asarray(scores), np.asarray(ids)
        if squeeze:
            return scores[0], ids[0]
        return scores, ids


@jax.jit
def _nearest_centroid(x, cent):
    # all metrics here reduce to max inner product on normalized data;
    # for raw ip we still use L2 assignment for balanced lists
    d = (
        jnp.sum(x**2, axis=1, keepdims=True)
        - 2.0 * x @ cent.T
        + jnp.sum(cent**2, axis=1)[None, :]
    )
    return jnp.argmin(d, axis=1)


@partial(jax.jit, static_argnames=("C",))
def _update_centroids(x, assign, C, prev):
    one_hot = jax.nn.one_hot(assign, C, dtype=jnp.float32)  # (N, C)
    sums = one_hot.T @ x  # (C, D)
    counts = jnp.sum(one_hot, axis=0)[:, None]
    return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), prev)


@partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_search(q, cent, vectors, list_ids, list_len, *, k, nprobe):
    B = q.shape[0]
    # 1) nearest centroids per query
    csims = q @ cent.T  # (B, C)
    _, probes = jax.lax.top_k(csims, nprobe)  # (B, nprobe)
    # 2) candidate rows: gather padded lists → (B, nprobe*L)
    cand = jnp.take(list_ids, probes, axis=0).reshape(B, -1)
    valid = cand >= 0
    cand_safe = jnp.maximum(cand, 0)
    vecs = jnp.take(vectors, cand_safe, axis=0)  # (B, M, D)
    sims = jnp.einsum(
        "bd,bmd->bm", q.astype(vecs.dtype), vecs, preferred_element_type=jnp.float32
    )
    sims = jnp.where(valid, sims, -jnp.inf)
    kk = min(k, sims.shape[1])
    best, pos = jax.lax.top_k(sims, kk)
    ids = jnp.take_along_axis(cand, pos, axis=1)
    return best, ids
