"""Small device-side k-means used by IVF coarse quantizers and int4 anchors."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


@jax.jit
def _nearest_centroid(x, cent):
    """L2 assignment (balanced lists even for raw-IP data)."""
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


@partial(jax.jit, static_argnames=("C",))
def _cluster_counts(assign, C):
    return jnp.bincount(assign, length=C)


def kmeans(
    sample,
    n_clusters: int,
    iters: int = 10,
    seed: int = 0,
    normalize: bool = False,
    balance_rounds: int = 2,
    balance_ratio: float = 4.0,
) -> jax.Array:
    """→ (C, D) f32 centroids. Host loop, device distance/update steps.

    Balancing: IVF pays the LONGEST list on every bounded probe (and the
    block table is C × max_fill), so after Lloyd convergence clusters larger
    than balance_ratio× the mean are SPLIT (their centroid duplicated with
    ±ε jitter, replacing the smallest clusters) and a few Lloyd steps
    re-run. Bounds the skew without a constrained-assignment solver."""
    x = jnp.asarray(sample, jnp.float32)
    n = x.shape[0]
    C = min(n_clusters, n)
    rng = np.random.default_rng(seed)
    cent = x[jnp.asarray(rng.choice(n, C, replace=False))]
    for _ in range(iters):
        assign = _nearest_centroid(x, cent)
        cent = _update_centroids(x, assign, C, cent)

    for _ in range(balance_rounds):
        assign = _nearest_centroid(x, cent)
        counts = np.asarray(_cluster_counts(assign, C))
        mean = max(1.0, n / C)
        big = np.where(counts > balance_ratio * mean)[0]
        if len(big) == 0:
            break
        small = np.argsort(counts)[: len(big)]
        cent_np = np.array(cent)  # writable copy
        assign_np = np.asarray(assign)
        x_np = np.asarray(x)
        for b, sm in zip(big, small):
            # bisect: seed the two children from random MEMBERS of the big
            # cluster (jittered-centroid splits re-collapse under Lloyd)
            members = np.where(assign_np == b)[0]
            picks = rng.choice(members, 2, replace=False)
            cent_np[b] = x_np[picks[0]]
            cent_np[sm] = x_np[picks[1]]
        cent = jnp.asarray(cent_np)
        for _ in range(max(2, iters // 3)):
            assign = _nearest_centroid(x, cent)
            cent = _update_centroids(x, assign, C, cent)

    if normalize:
        cent = cent / jnp.maximum(jnp.linalg.norm(cent, axis=1, keepdims=True), 1e-9)
    return cent
