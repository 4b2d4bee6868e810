"""On-HBM dense vector indexes with fused similarity + top-k query kernels.

The TPU-native replacement for the reference's vector-store layer — chromadb /
qdrant wrappers (reference: langchain_community/vectorstores/chroma.py:50-238)
whose hot loops (vector insert, QKᵀ similarity + top-k) ran inside a CPU
library. Here the index IS a device array:

- `FlatIndex` — exact search over f32 / bf16 / int8 / **int4** storage.
  * int8: per-vector symmetric scales; asymmetric scoring (int8 docs × bf16
    queries on the MXU, per-doc scale multiply on the VPU).
  * int4 (the north-star encoding, BASELINE.json): group-wise symmetric int4
    along the feature dim in the half-split packed layout of
    `ops/packing.py`, scored by the grouped-dequant Pallas GEMM
    (`ops/quant_matmul.woq_matmul` — the same kernel that replaces the
    reference's qbits WOQ GEMM, qbits/qbits.cpp:113). Three accuracy levers:
      1. a random orthogonal **rotation** (rank-preserving; spreads
         anisotropy/outliers so group absmax shrinks),
      2. **mean-centering** (residual range shrinks; the q·mean correction
         is added back so returned scores stay true inner products),
      3. optional k-means **anchors**: each doc stores an anchor id and an
         int4 residual — on clustered data residual norms are ≪1, cutting
         quantization noise by that ratio.
    Optionally a bf16 **shadow copy** (`rescore_dtype="bfloat16"`) enables
    two-tier search: int4 scan (¼ the HBM traffic) → top-m oversample →
    exact bf16 rescore. int4+bf16 together cost 0.63× of a FAISS-flat f32
    index — the "equal memory" north-star configuration — with recall
    equal to exact bf16 search (top-64 int4 containment of the true top-10
    is 1.0 at N=100k on both clustered and gaussian distributions).
- `ShardedFlatIndex` — rows sharded over a mesh axis with shard_map;
  device-side capacity-doubling appends (no host round-trips), per-device
  partial top-k, then an all-gather merge so query cost rides ICI not HBM.
- `IVFIndex` / `ShardedIVFIndex` — see `retrieval/ivf.py` (re-exported here).

Search methods (all indexes):
- "exact":          full top-k (lax.top_k) over all scores.
- "approx":         TPU bitonic approx top-k (lax.approx_max_k).
- "approx_rescore": approx top-m oversample (m=`oversample`), then exact
  top-k among the m candidates — recovers approx_max_k's recall loss at a
  fraction of exact top-k's cost (the strategy bench.py measured at
  recall 0.991 / ~390k QPS in round 1, now a public API).

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

from intel_extension_for_transformers_tpu.ops.packing import (
    QuantizedTensor,
    quantize_groupwise,
    dequantize,
)
from intel_extension_for_transformers_tpu.retrieval._kmeans import kmeans

__all__ = [
    "FlatIndex",
    "ShardedFlatIndex",
    "IVFIndex",
    "ShardedIVFIndex",
]


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


def random_rotation(dim: int, seed: int = 0) -> jax.Array:
    """Haar-random orthogonal (dim, dim) f32 — deterministic in `seed`."""
    return jax.random.orthogonal(jax.random.PRNGKey(seed), dim).astype(jnp.float32)


def _use_pallas() -> bool:
    from intel_extension_for_transformers_tpu.utils.device import (
        use_pallas_interpret,
    )

    return not use_pallas_interpret()


# --------------------------- scoring kernels ---------------------------


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
    sims = _dense_scores(queries, vectors, scales)
    sims = jnp.where(valid[None, :], sims, -jnp.inf)
    return _topk(sims, k, method, recall_target)


def _dense_scores(queries, vectors, scales):
    if scales is not None:
        # int8 docs × bf16 queries: MXU-friendly mixed matmul, then VPU scale
        sims = jax.lax.dot_general(
            queries.astype(jnp.bfloat16),
            vectors,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return sims * scales[None, :].astype(jnp.float32)
    # match query precision to index precision: exact f32 stays f32
    exact_f32 = vectors.dtype == jnp.float32
    return jax.lax.dot_general(
        queries.astype(vectors.dtype),
        vectors,
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST
        if exact_f32
        else jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


def _topk(sims, k, method, recall_target=0.99, oversample=64):
    """One fused top-k step. approx_rescore: approx top-m, exact top-k of m."""
    if method == "approx":
        return jax.lax.approx_max_k(sims, k, recall_target=recall_target)
    if method == "approx_rescore":
        m = min(max(oversample, k), sims.shape[-1])
        vals, ids = jax.lax.approx_max_k(sims, m, recall_target=recall_target)
        best, pos = jax.lax.top_k(vals, k)
        return best, jnp.take_along_axis(ids, pos, axis=1)
    return jax.lax.top_k(sims, k)


def _int4_qt(data, scales, dim, group_size) -> QuantizedTensor:
    """View packed column-major doc storage as a (K=dim, N=cols) weight."""
    return QuantizedTensor(
        data=data,
        scales=scales,
        zeros=None,
        weight_dtype="int4",
        scheme="sym",
        group_size=group_size,
        K=dim,
        N=data.shape[1],
    )


def _int4_scores(
    qrot,  # (B, D) rotated (+ normalized) queries, f32
    data,  # (D//2, N) packed int4 residuals
    scales,  # (D//g, N)
    anchors,  # (C, D) rotated anchors or None
    anchor_ids,  # (N,) int32 or None
    mean,  # (D,) rotated mean or None
    group_size: int,
    use_pallas: bool,
    out_dtype=jnp.float32,
):
    """→ (B, N) inner-product scores (corrections added back).

    `out_dtype=bfloat16` halves the HBM bytes of the dominant (B, N) score
    matrix — used when a shadow-rescore pass will restore full precision
    (the elementwise corrections fuse into the matmul epilogue, so only the
    low-precision matrix is ever written).
    """
    dim = qrot.shape[-1]
    qt = _int4_qt(data, scales, dim, group_size)
    if use_pallas:
        from intel_extension_for_transformers_tpu.ops.quant_matmul import woq_matmul

        sims = woq_matmul(qrot.astype(jnp.bfloat16), qt, out_dtype=out_dtype)
    else:
        # CPU/CI fallback: same math through the dequant oracle path
        sims = (qrot @ dequantize(qt, jnp.float32)).astype(out_dtype)
    if anchors is not None:
        qc = (qrot @ anchors.T).astype(out_dtype)  # (B, C)
        sims = sims + jnp.take(qc, anchor_ids, axis=1)
    if mean is not None:
        sims = sims + (qrot @ mean)[:, None].astype(out_dtype)
    return sims


@partial(
    jax.jit,
    static_argnames=("k", "method", "recall_target", "group_size", "use_pallas", "oversample"),
)
def _int4_search(
    qrot,
    data,
    scales,
    anchors,
    anchor_ids,
    mean,
    valid,
    shadow,  # (N, D) bf16 shadow (rotated space) or None
    *,
    k: int,
    method: str,
    recall_target: float,
    group_size: int,
    use_pallas: bool,
    oversample: int,
):
    scan_dtype = jnp.float32 if shadow is None else jnp.bfloat16
    sims = _int4_scores(
        qrot, data, scales, anchors, anchor_ids, mean, group_size, use_pallas,
        out_dtype=scan_dtype,
    )
    sims = jnp.where(valid[None, :], sims, jnp.asarray(-jnp.inf, scan_dtype))
    if shadow is None:
        return _topk(sims, k, method, recall_target, oversample)
    # two-tier: int4 scan selects m candidates; exact bf16 rescore ranks them
    m = min(max(oversample, k), sims.shape[-1])
    if method == "exact":
        _, cand = jax.lax.top_k(sims, m)
    else:
        _, cand = jax.lax.approx_max_k(sims, m, recall_target=recall_target)
    cvecs = jnp.take(shadow, cand, axis=0)  # (B, m, D)
    # the shadow stores FULL rotated vectors (pre-centering), so this dot is
    # already the true inner product — no mean correction here
    rescored = jnp.einsum(
        "bd,bmd->bm",
        qrot.astype(jnp.float32),
        cvecs.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    best, pos = jax.lax.top_k(rescored, k)
    return best, jnp.take_along_axis(cand, pos, axis=1)


class FlatIndex:
    """Exact on-HBM flat index (inner-product / cosine).

    Capacity-doubling preallocated storage keeps `add` from re-jitting:
    XLA programs are specialized on the static capacity, which only changes
    O(log N) times over an index build.

    int4 mode (`dtype="int4"`): group-wise symmetric int4 encoding of
    rotated, centered vectors (optionally anchor residuals — call
    `train_anchors` before the first add). ~0.27× the memory of bf16
    storage (data exactly ¼; group scales add ~1.6% at group_size=64).
    With `rescore_dtype="bfloat16"` a bf16 shadow is kept and every search
    is two-tier scan→rescore: recall equals exact-bf16 search while the
    scan pass reads ~3.8× less HBM; total memory is 0.63× a FAISS-flat f32
    index (the north star's equal-memory contract, BASELINE.json).
    """

    def __init__(
        self,
        dim: int,
        dtype: str = "bfloat16",  # "float32" | "bfloat16" | "int8" | "int4"
        metric: str = "ip",  # "ip" | "cosine"
        capacity: int = 4096,
        *,
        group_size: int = 64,  # int4: scale granularity along dim
        rotate: bool = True,  # int4: random orthogonal pre-rotation
        center: bool = True,  # int4: subtract (first-batch) mean pre-encode
        rescore_dtype: Optional[str] = None,  # int4: "bfloat16" | "float32"
        rotation_seed: int = 0,
    ):
        if dtype not in ("float32", "bfloat16", "int8", "int4"):
            raise ValueError(f"unsupported index dtype {dtype}")
        if metric not in ("ip", "cosine"):
            raise ValueError(f"unsupported metric {metric}")
        if rescore_dtype is not None and dtype != "int4":
            raise ValueError("rescore_dtype is only meaningful for dtype='int4'")
        self.dim = dim
        self.dtype = dtype
        self.metric = metric
        self.size = 0
        self._capacity = max(int(capacity), 8)
        self.group_size = group_size
        self.rotate = rotate
        self.center = center
        self.rescore_dtype = rescore_dtype
        self.rotation_seed = rotation_seed

        if dtype == "int4":
            if dim % 2:
                raise ValueError("int4 index needs even dim")
            if (dim // 2) % group_size:
                raise ValueError(
                    f"group_size={group_size} must divide dim//2={dim // 2}"
                )
            self._rotation = (
                random_rotation(dim, rotation_seed) if rotate else None
            )
            self._mean: Optional[jax.Array] = None  # (D,) rotated space
            self._anchors: Optional[jax.Array] = None  # (C, D) rotated space
            self._data = jnp.zeros((dim // 2, self._capacity), jnp.int8)
            self._scales = jnp.zeros(
                (dim // group_size, self._capacity), jnp.bfloat16
            )
            self._anchor_ids: Optional[jax.Array] = None
            self._shadow = (
                jnp.zeros((self._capacity, dim), jnp.dtype(rescore_dtype))
                if rescore_dtype
                else None
            )
            self._vectors = None
            self._vec_scales = None
        else:
            store_dtype = jnp.int8 if dtype == "int8" else jnp.dtype(dtype)
            self._vectors = jnp.zeros((self._capacity, dim), store_dtype)
            self._vec_scales = (
                jnp.zeros((self._capacity,), jnp.float32) if dtype == "int8" else None
            )

    def __len__(self) -> int:
        return self.size

    @property
    def nbytes(self) -> int:
        """Per-doc payload bytes actually held on device (filled rows)."""
        n = self.size
        if n == 0:
            return 0
        if self.dtype == "int4":
            b = (self.dim // 2) * n + self._scales.dtype.itemsize * (
                self.dim // self.group_size
            ) * n
            if self._anchor_ids is not None:
                b += 4 * n
            if self._shadow is not None:
                b += self._shadow.dtype.itemsize * self.dim * n
            return b
        b = self._vectors.dtype.itemsize * self.dim * n
        if self._vec_scales is not None:
            b += 4 * n
        return b

    @property
    def memory_ratio_vs_bf16(self) -> float:
        """Payload bytes relative to a bf16 flat index of the same size."""
        if self.size == 0:
            return 0.0
        return self.nbytes / (2 * self.dim * self.size)

    def train_anchors(self, sample, n_anchors: int = 1024, iters: int = 8) -> None:
        """int4 only: k-means anchors for residual encoding. Call before add."""
        if self.dtype != "int4":
            raise ValueError("anchors only apply to dtype='int4'")
        if self.size:
            raise ValueError("train_anchors must run before the first add")
        x = jnp.asarray(sample, jnp.float32)
        if self.metric == "cosine":
            x = _l2_normalize(x)
        if self._rotation is not None:
            x = x @ self._rotation
        self._anchors = kmeans(x, n_anchors, iters=iters)
        self._anchor_ids = jnp.zeros((self._capacity,), jnp.int32)
        self.center = False  # anchors subsume centering

    # ------------------------------ add ------------------------------

    def _grow(self, need: int) -> None:
        new_cap = self._capacity
        while new_cap < need:
            new_cap *= 2
        if new_cap == self._capacity:
            return
        pad = new_cap - self._capacity
        if self.dtype == "int4":
            self._data = jnp.concatenate(
                [self._data, jnp.zeros((self.dim // 2, pad), jnp.int8)], axis=1
            )
            self._scales = jnp.concatenate(
                [self._scales, jnp.zeros((self._scales.shape[0], pad), self._scales.dtype)],
                axis=1,
            )
            if self._anchor_ids is not None:
                self._anchor_ids = jnp.concatenate(
                    [self._anchor_ids, jnp.zeros((pad,), jnp.int32)]
                )
            if self._shadow is not None:
                self._shadow = jnp.concatenate(
                    [self._shadow, jnp.zeros((pad, self.dim), self._shadow.dtype)]
                )
        else:
            self._vectors = jnp.concatenate(
                [self._vectors, jnp.zeros((pad, self.dim), self._vectors.dtype)]
            )
            if self._vec_scales is not None:
                self._vec_scales = jnp.concatenate(
                    [self._vec_scales, jnp.zeros((pad,), jnp.float32)]
                )
        self._capacity = new_cap

    def _encode_int4(self, vectors: jax.Array):
        """→ (data (D//2, M), scales (G, M), shadow (M, D)|None, aids|None)."""
        x = vectors.astype(jnp.float32)
        if self._rotation is not None:
            x = x @ self._rotation
        shadow = x.astype(jnp.dtype(self.rescore_dtype)) if self.rescore_dtype else None
        aids = None
        if self._anchors is not None:
            aids = jnp.argmax(x @ self._anchors.T, axis=1).astype(jnp.int32)
            x = x - jnp.take(self._anchors, aids, axis=0)
        else:
            if self.center and self._mean is None:
                self._mean = jnp.mean(x, axis=0)
            if self._mean is not None:
                x = x - self._mean
        qt = quantize_groupwise(
            x.T, "int4", "sym", self.group_size, scale_dtype=jnp.bfloat16
        )
        return qt.data, qt.scales, shadow, aids

    def add(self, vectors) -> np.ndarray:
        """Insert (M, D) vectors; returns their assigned ids."""
        vectors = jnp.asarray(vectors)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected (M, {self.dim}) vectors, got {vectors.shape}")
        M = vectors.shape[0]
        if self.metric == "cosine":
            vectors = _l2_normalize(vectors)
        self._grow(self.size + M)
        if self.dtype == "int4":
            data, scales, shadow, aids = self._encode_int4(vectors)
            self._data = jax.lax.dynamic_update_slice(self._data, data, (0, self.size))
            self._scales = jax.lax.dynamic_update_slice(
                self._scales, scales, (0, self.size)
            )
            if shadow is not None:
                self._shadow = jax.lax.dynamic_update_slice(
                    self._shadow, shadow, (self.size, 0)
                )
            if aids is not None:
                self._anchor_ids = jax.lax.dynamic_update_slice(
                    self._anchor_ids, aids, (self.size,)
                )
        elif self.dtype == "int8":
            q, s = _encode_int8(vectors)
            self._vectors = jax.lax.dynamic_update_slice(
                self._vectors, q, (self.size, 0)
            )
            self._vec_scales = jax.lax.dynamic_update_slice(
                self._vec_scales, s, (self.size,)
            )
        else:
            self._vectors = jax.lax.dynamic_update_slice(
                self._vectors, vectors.astype(self._vectors.dtype), (self.size, 0)
            )
        ids = np.arange(self.size, self.size + M)
        self.size += M
        return ids

    # ----------------------------- search -----------------------------

    def search(
        self,
        queries,
        k: int = 10,
        method: str = "exact",
        recall_target: float = 0.99,
        oversample: int = 64,
    ) -> tuple[np.ndarray, np.ndarray]:
        """→ (scores (B, k), ids (B, k)).

        method: "exact" | "approx" | "approx_rescore" (see module docstring).
        """
        if self.size == 0:
            raise ValueError("index is empty")
        if method not in ("exact", "approx", "approx_rescore"):
            raise ValueError(f"unknown search method {method!r}")
        queries = jnp.asarray(queries)
        squeeze = queries.ndim == 1
        if squeeze:
            queries = queries[None, :]
        if self.metric == "cosine":
            queries = _l2_normalize(queries)
        k = min(k, self.size)
        fused = self._fused_scan_search(queries, k, method, oversample)
        if fused is not None:
            scores, ids = fused
            scores, ids = np.asarray(scores), np.asarray(ids)
            if squeeze:
                return scores[0], ids[0]
            return scores, ids
        valid = jnp.arange(self._capacity) < self.size
        if self.dtype == "int4":
            qrot = queries.astype(jnp.float32)
            if self._rotation is not None:
                qrot = qrot @ self._rotation
            scores, ids = _int4_search(
                qrot,
                self._data,
                self._scales,
                self._anchors,
                self._anchor_ids,
                self._mean,
                valid,
                self._shadow,
                k=k,
                method=method,
                recall_target=recall_target,
                group_size=self.group_size,
                use_pallas=_use_pallas(),
                oversample=oversample,
            )
        else:
            if method == "approx_rescore":
                scores, ids = _score_and_topk_rescore(
                    queries,
                    self._vectors,
                    self._vec_scales,
                    valid,
                    k=k,
                    recall_target=recall_target,
                    oversample=oversample,
                )
            else:
                scores, ids = _score_and_topk(
                    queries,
                    self._vectors,
                    self._vec_scales,
                    valid,
                    k=k,
                    method=method,
                    recall_target=recall_target,
                )
        scores, ids = np.asarray(scores), np.asarray(ids)
        if squeeze:
            return scores[0], ids[0]
        return scores, ids

    def _fused_scan_search(self, queries, k, method, oversample):
        """Transparent fast path: the fused Pallas scan+top-2 kernel
        (ops/scan_topk.py) replaces the materialized (B, N) score pass for
        approx_rescore on bf16/f32 indexes and on int4 indexes with a bf16
        shadow. Returns None when not applicable (CPU/interpret, tiny
        batches where dispatch overhead dominates, int8 scaling)."""
        if method != "approx_rescore" or not _use_pallas():
            return None
        B = queries.shape[0]
        if B < 64 or self.size < 4096:
            return None
        if self.dtype in ("float32", "bfloat16"):
            docs = self._vectors
            q = queries
        elif self.dtype == "int4" and self._shadow is not None:
            docs = self._shadow
            q = queries.astype(jnp.float32)
            if self._rotation is not None:
                q = q @ self._rotation  # shadow lives in rotated space
        else:
            return None
        from intel_extension_for_transformers_tpu.ops.scan_topk import (
            scan_topk_candidates,
        )

        m = max(oversample, k)
        scores, ids = scan_topk_candidates(q, docs, jnp.int32(self.size), m=m)
        return scores[:, :k], ids[:, :k]

    # -- persistence (reference: Chroma persist/reload, chroma.py:118-238) --
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        arrays = {}
        if self.dtype == "int4":
            arrays["data"] = np.asarray(self._data[:, : self.size])
            arrays["scales"] = np.asarray(
                self._scales[:, : self.size].astype(jnp.float32)
            )
            if self._mean is not None:
                arrays["mean"] = np.asarray(self._mean)
            if self._anchors is not None:
                arrays["anchors"] = np.asarray(self._anchors)
                arrays["anchor_ids"] = np.asarray(self._anchor_ids[: self.size])
            if self._shadow is not None:
                arrays["shadow"] = np.asarray(
                    self._shadow[: self.size].astype(jnp.float32)
                )
        else:
            vec = self._vectors[: self.size]
            if vec.dtype == jnp.bfloat16:  # numpy has no bf16; store f32
                vec = vec.astype(jnp.float32)
            arrays["vectors"] = np.asarray(vec)
            if self._vec_scales is not None:
                arrays["scales"] = np.asarray(self._vec_scales[: self.size])
        np.savez(os.path.join(path, "index.npz"), **arrays)
        with open(os.path.join(path, "index.json"), "w") as f:
            json.dump(
                {
                    "type": "flat",
                    "dim": self.dim,
                    "dtype": self.dtype,
                    "metric": self.metric,
                    "size": self.size,
                    "group_size": self.group_size,
                    "rotate": self.rotate,
                    "center": self.center,
                    "rescore_dtype": self.rescore_dtype,
                    "rotation_seed": self.rotation_seed,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "FlatIndex":
        with open(os.path.join(path, "index.json")) as f:
            meta = json.load(f)
        npz = np.load(os.path.join(path, "index.npz"))
        n = meta["size"]
        idx = cls(
            meta["dim"],
            meta["dtype"],
            meta["metric"],
            capacity=max(n, 8),
            group_size=meta.get("group_size", 64),
            rotate=meta.get("rotate", True),
            center=meta.get("center", True),
            rescore_dtype=meta.get("rescore_dtype"),
            rotation_seed=meta.get("rotation_seed", 0),
        )
        if meta["dtype"] == "int4":
            idx._data = jax.lax.dynamic_update_slice(
                idx._data, jnp.asarray(npz["data"]), (0, 0)
            )
            idx._scales = jax.lax.dynamic_update_slice(
                idx._scales, jnp.asarray(npz["scales"]).astype(jnp.bfloat16), (0, 0)
            )
            if "mean" in npz:
                idx._mean = jnp.asarray(npz["mean"])
            if "anchors" in npz:
                idx._anchors = jnp.asarray(npz["anchors"])
                idx._anchor_ids = jnp.zeros((idx._capacity,), jnp.int32)
                idx._anchor_ids = jax.lax.dynamic_update_slice(
                    idx._anchor_ids, jnp.asarray(npz["anchor_ids"]), (0,)
                )
                idx.center = False
            if "shadow" in npz:
                idx._shadow = jax.lax.dynamic_update_slice(
                    idx._shadow,
                    jnp.asarray(npz["shadow"]).astype(idx._shadow.dtype),
                    (0, 0),
                )
        else:
            idx._vectors = jax.lax.dynamic_update_slice(
                idx._vectors,
                jnp.asarray(npz["vectors"]).astype(idx._vectors.dtype),
                (0, 0),
            )
            if idx._vec_scales is not None and "scales" in npz:
                idx._vec_scales = jax.lax.dynamic_update_slice(
                    idx._vec_scales, jnp.asarray(npz["scales"]), (0,)
                )
        idx.size = n
        return idx


@partial(jax.jit, static_argnames=("k", "recall_target", "oversample"))
def _score_and_topk_rescore(
    queries, vectors, scales, valid, *, k, recall_target, oversample
):
    sims = _dense_scores(queries, vectors, scales)
    sims = jnp.where(valid[None, :], sims, -jnp.inf)
    return _topk(sims, k, "approx_rescore", recall_target, oversample)


# ======================== sharded flat index ========================


class ShardedFlatIndex:
    """Flat index with rows sharded across a mesh axis.

    Query plan (north-star design, SURVEY.md §2.3): queries replicate to all
    devices; each device scans its row shard and keeps a local top-k; the
    k-per-shard candidates all-gather over ICI and the final top-k runs
    replicated — O(N/P) HBM traffic per chip, O(k·P) interconnect bytes.

    Build plan: appends are device-side. Each shard holds a capacity-doubling
    local buffer; an incoming batch is split into equal per-shard chunks
    (block layout — the ids array maps rows back to insert order) and written
    with one `dynamic_update_slice` per shard inside shard_map. No host
    round-trip of existing rows (the round-1 weakness: O(N) re-upload per
    add, VERDICT.md "What's weak" #3).

    dtypes: float32 | bfloat16 | int8 | int4 (rotation + centering; anchors
    are not supported sharded — use `rescore_dtype` for recall parity).
    """

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        axis: str = "dp",
        dtype: str = "bfloat16",
        metric: str = "ip",
        *,
        group_size: int = 64,
        rotate: bool = True,
        center: bool = True,
        rescore_dtype: Optional[str] = None,
        rotation_seed: int = 0,
        initial_capacity: int = 1024,
    ):
        if dtype not in ("float32", "bfloat16", "int8", "int4"):
            raise ValueError(f"unsupported index dtype {dtype}")
        if rescore_dtype is not None and dtype != "int4":
            raise ValueError("rescore_dtype is only meaningful for dtype='int4'")
        self.dim = dim
        self.mesh = mesh
        self.axis = axis
        self.dtype = dtype
        self.metric = metric
        self.n_shards = mesh.shape[axis]
        self.size = 0
        self.group_size = group_size
        self.rotate = rotate and dtype == "int4"
        self.center = center and dtype == "int4"
        self.rescore_dtype = rescore_dtype
        self.rotation_seed = rotation_seed
        if dtype == "int4":
            if dim % 2 or (dim // 2) % group_size:
                raise ValueError(
                    f"int4 needs even dim and group_size | dim//2 (dim={dim})"
                )
            self._rotation = random_rotation(dim, rotation_seed) if self.rotate else None
            self._mean: Optional[jax.Array] = None
        self._fill = 0  # per-shard fill (equal across shards by construction)
        self._cap = 0  # per-shard capacity
        self._initial_cap = max(8, initial_capacity // self.n_shards)
        # sharded buffers (allocated on first add)
        self._ids = None  # (P*cap,) int32, P(axis); -1 = empty slot
        self._vectors = None  # float/int8: (P*cap, D), P(axis, None)
        self._vec_scales = None  # int8: (P*cap,), P(axis)
        self._data = None  # int4: (D//2, P*cap), P(None, axis)
        self._scales = None  # int4: (G, P*cap), P(None, axis)
        self._shadow = None  # int4 rescore: (P*cap, D), P(axis, None)
        self._row_shd = NamedSharding(mesh, P(axis, None))
        self._col_shd = NamedSharding(mesh, P(None, axis))
        self._vec1_shd = NamedSharding(mesh, P(axis))
        self._repl = NamedSharding(mesh, P())

    def __len__(self):
        return self.size

    @property
    def nbytes(self) -> int:
        n = self.size
        if n == 0:
            return 0
        if self.dtype == "int4":
            b = (self.dim // 2 + 2 * (self.dim // self.group_size) + 4) * n
            if self._shadow is not None:
                b += self._shadow.dtype.itemsize * self.dim * n
            return b
        b = (jnp.dtype(jnp.int8 if self.dtype == "int8" else self.dtype).itemsize
             * self.dim + 4) * n
        if self.dtype == "int8":
            b += 4 * n
        return b

    def _alloc(self, cap: int) -> None:
        """Allocate fresh sharded buffers of per-shard capacity `cap`."""
        Pn = self.n_shards
        self._ids = jax.device_put(
            np.full((Pn * cap,), -1, np.int32), self._vec1_shd
        )
        if self.dtype == "int4":
            self._data = jax.device_put(
                np.zeros((self.dim // 2, Pn * cap), np.int8), self._col_shd
            )
            self._scales = jax.device_put(
                jnp.zeros((self.dim // self.group_size, Pn * cap), jnp.bfloat16),
                self._col_shd,
            )
            if self.rescore_dtype:
                self._shadow = jax.device_put(
                    jnp.zeros((Pn * cap, self.dim), jnp.dtype(self.rescore_dtype)),
                    self._row_shd,
                )
        else:
            sdt = jnp.int8 if self.dtype == "int8" else jnp.dtype(self.dtype)
            self._vectors = jax.device_put(
                jnp.zeros((Pn * cap, self.dim), sdt), self._row_shd
            )
            if self.dtype == "int8":
                self._vec_scales = jax.device_put(
                    jnp.zeros((Pn * cap,), jnp.float32), self._vec1_shd
                )
        self._cap = cap

    def _grow(self, need_per_shard: int) -> None:
        """Device-side per-shard capacity doubling (pad each local block)."""
        if self._cap == 0:
            cap = self._initial_cap
            while cap < need_per_shard:
                cap *= 2
            self._alloc(cap)
            return
        if need_per_shard <= self._cap:
            return
        new_cap = self._cap
        while new_cap < need_per_shard:
            new_cap *= 2
        pad = new_cap - self._cap
        mesh, axis = self.mesh, self.axis

        self._ids = _pad_shard_rows(mesh, axis, pad, -1, self._ids)
        if self.dtype == "int4":
            self._data = _pad_shard_cols(mesh, axis, pad, self._data)
            self._scales = _pad_shard_cols(mesh, axis, pad, self._scales)
            if self._shadow is not None:
                self._shadow = _pad_shard_rows(mesh, axis, pad, 0, self._shadow)
        else:
            self._vectors = _pad_shard_rows(mesh, axis, pad, 0, self._vectors)
            if self._vec_scales is not None:
                self._vec_scales = _pad_shard_rows(
                    mesh, axis, pad, 0, self._vec_scales
                )
        self._cap = new_cap

    def add(self, vectors) -> np.ndarray:
        """Bulk insert; returns insert-order ids. Appends stay device-side."""
        vectors = jnp.asarray(vectors)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected (M, {self.dim}) vectors, got {vectors.shape}")
        if self.metric == "cosine":
            vectors = _l2_normalize(vectors)
        M = vectors.shape[0]
        Pn = self.n_shards
        chunk = -(-M // Pn)
        m_pad = chunk * Pn
        ids_new = np.full((m_pad,), -1, np.int32)
        ids_new[:M] = np.arange(self.size, self.size + M)
        if m_pad != M:
            vectors = jnp.concatenate(
                [vectors, jnp.zeros((m_pad - M, self.dim), vectors.dtype)]
            )
        self._grow(self._fill + chunk)

        mesh, axis, fill = self.mesh, self.axis, self._fill
        ids_dev = jax.device_put(ids_new, self._vec1_shd)
        self._ids = _append_rows(mesh, axis, self._ids, ids_dev, fill)

        if self.dtype == "int4":
            x = vectors.astype(jnp.float32)
            if self._rotation is not None:
                x = x @ self._rotation
            if self.rescore_dtype:
                shadow = jax.device_put(
                    x.astype(jnp.dtype(self.rescore_dtype)), self._row_shd
                )
                self._shadow = _append_rows(mesh, axis, self._shadow, shadow, fill)
            if self.center and self._mean is None:
                self._mean = jnp.mean(x[:M] if m_pad != M else x, axis=0)
            if self._mean is not None:
                x = x - self._mean
            qt = quantize_groupwise(
                x.T, "int4", "sym", self.group_size, scale_dtype=jnp.bfloat16
            )
            data = jax.device_put(qt.data, self._col_shd)
            scales = jax.device_put(qt.scales, self._col_shd)
            self._data = _append_cols(mesh, axis, self._data, data, fill)
            self._scales = _append_cols(mesh, axis, self._scales, scales, fill)
        elif self.dtype == "int8":
            q, s = _encode_int8(vectors)
            self._vectors = _append_rows(
                mesh, axis, self._vectors, jax.device_put(q, self._row_shd), fill
            )
            self._vec_scales = _append_rows(
                mesh, axis, self._vec_scales, jax.device_put(s, self._vec1_shd), fill
            )
        else:
            v = jax.device_put(
                vectors.astype(self._vectors.dtype), self._row_shd
            )
            self._vectors = _append_rows(mesh, axis, self._vectors, v, fill)

        self._fill += chunk
        self.size += M
        return ids_new[:M]

    def search(
        self,
        queries,
        k: int = 10,
        method: str = "exact",
        recall_target: float = 0.99,
        oversample: int = 64,
    ):
        if self.size == 0:
            raise ValueError("index is empty")
        if method not in ("exact", "approx", "approx_rescore"):
            raise ValueError(f"unknown search method {method!r}")
        queries = jnp.asarray(queries)
        squeeze = queries.ndim == 1
        if squeeze:
            queries = queries[None, :]
        if self.metric == "cosine":
            queries = _l2_normalize(queries)
        k = min(k, self.size)
        if self.dtype == "int4":
            qrot = queries.astype(jnp.float32)
            if self._rotation is not None:
                qrot = qrot @ self._rotation
            qrot = jax.device_put(qrot, self._repl)
            mean = (
                self._mean
                if self._mean is not None
                else jnp.zeros((self.dim,), jnp.float32)
            )
            scores, ids = _sharded_int4_search(
                qrot,
                self._data,
                self._scales,
                jax.device_put(mean, self._repl),
                self._ids,
                self._shadow,
                mesh=self.mesh,
                axis=self.axis,
                k=k,
                method=method,
                recall_target=recall_target,
                group_size=self.group_size,
                use_pallas=_use_pallas(),
                oversample=oversample,
                has_mean=self._mean is not None,
            )
        else:
            queries = jax.device_put(queries, self._repl)
            has_scales = self._vec_scales is not None
            scales = (
                self._vec_scales
                if has_scales
                else jax.device_put(
                    jnp.ones((self.n_shards * self._cap,), jnp.float32),
                    self._vec1_shd,
                )
            )
            scores, ids = _sharded_search(
                queries,
                self._vectors,
                scales,
                self._ids,
                mesh=self.mesh,
                axis=self.axis,
                k=k,
                method=method,
                recall_target=recall_target,
                has_scales=has_scales,
                oversample=oversample,
            )
        scores, ids = np.asarray(scores), np.asarray(ids)
        if squeeze:
            return scores[0], ids[0]
        return scores, ids


@partial(jax.jit, static_argnames=("mesh", "axis"), donate_argnums=(2,))
def _append_rows_jit(mesh, axis, buf, new, fill):
    """Per-shard dynamic_update_slice along axis 0 (rows) at offset fill."""

    def f(loc, nloc, off):
        idx = (off[0],) + (0,) * (loc.ndim - 1)
        return jax.lax.dynamic_update_slice(loc, nloc.astype(loc.dtype), idx)

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )(buf, new, fill)


def _append_rows(mesh, axis, buf, new, fill):
    return _append_rows_jit(mesh, axis, buf, new, jnp.array([fill], jnp.int32))


@partial(jax.jit, static_argnames=("mesh", "axis"), donate_argnums=(2,))
def _append_cols_jit(mesh, axis, buf, new, fill):
    """Per-shard dynamic_update_slice along the last (column) axis."""

    def f(loc, nloc, off):
        idx = (0,) * (loc.ndim - 1) + (off[0],)
        return jax.lax.dynamic_update_slice(loc, nloc.astype(loc.dtype), idx)

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )(buf, new, fill)


def _append_cols(mesh, axis, buf, new, fill):
    return _append_cols_jit(mesh, axis, buf, new, jnp.array([fill], jnp.int32))


@partial(jax.jit, static_argnames=("mesh", "axis", "pad", "fill_value"))
def _pad_shard_rows(mesh, axis, pad, fill_value, a):
    """Grow per-shard capacity: pad each local row block (device-side)."""

    def f(loc):
        p = jnp.full((pad,) + loc.shape[1:], fill_value, loc.dtype)
        return jnp.concatenate([loc, p], axis=0)

    return jax.shard_map(
        f, mesh=mesh, in_specs=P(axis), out_specs=P(axis), check_vma=False
    )(a)


@partial(jax.jit, static_argnames=("mesh", "axis", "pad"))
def _pad_shard_cols(mesh, axis, pad, a):
    def f(loc):
        p = jnp.zeros(loc.shape[:-1] + (pad,), loc.dtype)
        return jnp.concatenate([loc, p], axis=-1)

    return jax.shard_map(
        f, mesh=mesh, in_specs=P(None, axis), out_specs=P(None, axis),
        check_vma=False,
    )(a)


def _merge_local_topk(scores, gids, axis, k):
    """all-gather per-shard candidates over ICI; replicated exact merge."""
    all_scores = jax.lax.all_gather(scores, axis, axis=1)  # (B, P, m)
    all_ids = jax.lax.all_gather(gids, axis, axis=1)
    B = scores.shape[0]
    best, pos = jax.lax.top_k(all_scores.reshape(B, -1), k)
    return best, jnp.take_along_axis(all_ids.reshape(B, -1), pos, axis=1)


@partial(
    jax.jit,
    static_argnames=("mesh", "axis", "k", "method", "recall_target", "has_scales", "oversample"),
)
def _sharded_search(
    queries, vectors, scales, ids, *, mesh, axis, k, method, recall_target,
    has_scales, oversample,
):
    cap = vectors.shape[0] // mesh.shape[axis]
    m = min(k, cap)

    def shard_fn(q, v, s, rid):
        valid = rid >= 0
        sims = _dense_scores(q, v, s if has_scales else None)
        sims = jnp.where(valid[None, :], sims, -jnp.inf)
        scores, loc = _topk(sims, m, method, recall_target, oversample)
        gids = jnp.take(rid, loc)  # (B, m) stored insert-order ids
        return _merge_local_topk(scores, gids, axis, k)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, vectors, scales, ids)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis", "k", "method", "recall_target", "group_size",
        "use_pallas", "oversample", "has_mean",
    ),
)
def _sharded_int4_search(
    qrot, data, scales, mean, ids, shadow, *, mesh, axis, k, method,
    recall_target, group_size, use_pallas, oversample, has_mean,
):
    cap = data.shape[1] // mesh.shape[axis]
    dim = qrot.shape[-1]
    have_shadow = shadow is not None
    m = min(max(oversample, k) if have_shadow else k, cap)

    def shard_fn(q, d, s, mu, rid, *maybe_shadow):
        valid = rid >= 0
        scan_dtype = jnp.bfloat16 if have_shadow else jnp.float32
        sims = _int4_scores(
            q, d, s, None, None, mu if has_mean else None, group_size,
            use_pallas, out_dtype=scan_dtype,
        )
        sims = jnp.where(valid[None, :], sims, jnp.asarray(-jnp.inf, scan_dtype))
        if have_shadow:
            sh = maybe_shadow[0]
            if method == "exact":
                _, cand = jax.lax.top_k(sims, m)
            else:
                _, cand = jax.lax.approx_max_k(sims, m, recall_target=recall_target)
            cvecs = jnp.take(sh, cand, axis=0)
            # shadow rows are full (uncentered) rotated vectors: true IP
            rescored = jnp.einsum(
                "bd,bmd->bm",
                q.astype(jnp.float32),
                cvecs.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            # invalid slots may be re-picked by rescore: mask via gathered ids
            cand_ids = jnp.take(rid, cand)
            rescored = jnp.where(cand_ids >= 0, rescored, -jnp.inf)
            kk = min(k, m)
            scores, pos = jax.lax.top_k(rescored, kk)
            gids = jnp.take_along_axis(cand_ids, pos, axis=1)
        else:
            scores, loc = _topk(sims, m, method, recall_target, oversample)
            gids = jnp.take(rid, loc)
        return _merge_local_topk(scores, gids, axis, k)

    extra = (shadow,) if have_shadow else ()
    extra_specs = (P(axis, None),) if have_shadow else ()
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis), P(), P(axis)) + extra_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )(qrot, data, scales, mean, ids, *extra)


# IVF lives in its own module; re-exported here for backward compatibility.
from intel_extension_for_transformers_tpu.retrieval.ivf import (  # noqa: E402
    IVFIndex,
    ShardedIVFIndex,
)
