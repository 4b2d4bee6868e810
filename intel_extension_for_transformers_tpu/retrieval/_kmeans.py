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


def kmeans(
    sample, n_clusters: int, iters: int = 10, seed: int = 0, normalize: bool = False
) -> jax.Array:
    """→ (C, D) f32 centroids. Host loop, device distance/update steps."""
    x = jnp.asarray(sample, jnp.float32)
    n = x.shape[0]
    C = min(n_clusters, n)
    rng = np.random.default_rng(seed)
    cent = x[jnp.asarray(rng.choice(n, C, replace=False))]
    for _ in range(iters):
        assign = _nearest_centroid(x, cent)
        cent = _update_centroids(x, assign, C, cent)
    if normalize:
        cent = cent / jnp.maximum(jnp.linalg.norm(cent, axis=1, keepdims=True), 1e-9)
    return cent
