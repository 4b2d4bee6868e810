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


@jax.jit
def _rank_in_group(assign):
    """Rank of each row among rows with the same value (stable, static
    shapes): sort by value, positions within a run are consecutive."""
    n = assign.shape[0]
    order = jnp.argsort(assign, stable=True)
    sorted_a = jnp.take(assign, order)
    idx = jnp.arange(n)
    run_start = jnp.where(
        jnp.concatenate([jnp.array([True]), sorted_a[1:] != sorted_a[:-1]]),
        idx, 0,
    )
    run_start = jax.lax.associative_scan(jnp.maximum, run_start)
    rank_sorted = idx - run_start
    return jnp.zeros_like(assign).at[order].set(rank_sorted)


@partial(jax.jit, static_argnames=("C", "rounds"))
def _assign_constrained(x, cent, cap, C, rounds: int = 4):
    """Capacity-constrained assignment: every point lands in one of its
    `rounds` nearest clusters if one has room, else in guaranteed free
    capacity (so counts ≤ cap ALWAYS, no point dropped). Fully vectorized —
    no per-point host loop; same-cluster contention within a round is
    serialized by rank-in-group.

    The balanced-k-means move of the constrained quantizers FAISS-style
    systems use at 100M scale, recast for the TPU: R capped rounds + a
    free-slot searchsorted fallback instead of a sequential auction."""
    n = x.shape[0]
    d = (
        jnp.sum(x**2, axis=1, keepdims=True)
        - 2.0 * x @ cent.T
        + jnp.sum(cent**2, axis=1)[None, :]
    )
    _, topk = jax.lax.top_k(-d, rounds)  # (n, R)
    assign = jnp.zeros((n,), jnp.int32)
    placed = jnp.zeros((n,), bool)
    fill = jnp.zeros((C,), jnp.int32)
    for r in range(rounds):
        cand = topk[:, r].astype(jnp.int32)
        a = jnp.where(placed, C, cand)  # C = sentinel for already-placed
        sl = jnp.take(fill, jnp.clip(a, 0, C - 1)) + _rank_in_group(a)
        ok = (~placed) & (sl < cap)
        assign = jnp.where(ok, cand, assign)
        fill = fill + jnp.bincount(
            jnp.where(ok, cand, C), length=C + 1
        )[:C].astype(jnp.int32)
        placed = placed | ok
    # leftovers → global free capacity (cap·C ≥ n guarantees room): the
    # j-th leftover takes the j-th slot of the concatenated free-slot space
    free = jnp.maximum(cap - fill, 0)
    cum = jnp.cumsum(free)
    leftover_rank = jnp.cumsum(~placed) - 1  # rank among leftovers
    fallback = jnp.searchsorted(cum, leftover_rank, side="right").astype(
        jnp.int32
    )
    assign = jnp.where(placed, assign, jnp.clip(fallback, 0, C - 1))
    return assign


def kmeans(
    sample,
    n_clusters: int,
    iters: int = 10,
    seed: int = 0,
    normalize: bool = False,
    balance_rounds: int = 2,
    balance_ratio: float = 4.0,
    constrained: bool = False,
    cap_slack: float = 1.1,
) -> jax.Array:
    """→ (C, D) f32 centroids. Host loop, device distance/update steps.

    Balancing: IVF pays the LONGEST list on every bounded probe (and the
    block table is C × max_fill), so after Lloyd convergence clusters larger
    than balance_ratio× the mean are SPLIT (their centroid duplicated with
    ±ε jitter, replacing the smallest clusters) and a few Lloyd steps
    re-run. Bounds the skew without a constrained-assignment solver.

    constrained=True instead runs every Lloyd step with the capacity-
    constrained assignment (`_assign_constrained`, per-cluster cap =
    cap_slack·n/C): centroids converge to near-equal-MASS Voronoi regions,
    so nearest-centroid inserts stay balanced by construction — the
    exact-memory option for 100M-scale builds (COVERAGE.md gap #1)."""
    x = jnp.asarray(sample, jnp.float32)
    n = x.shape[0]
    C = min(n_clusters, n)
    rng = np.random.default_rng(seed)
    cent = x[jnp.asarray(rng.choice(n, C, replace=False))]
    cap = int(np.ceil(cap_slack * n / C)) if constrained else 0
    for _ in range(iters):
        if constrained:
            assign = _assign_constrained(x, cent, cap, C)
        else:
            assign = _nearest_centroid(x, cent)
        cent = _update_centroids(x, assign, C, cent)
    if constrained:
        balance_rounds = 0  # capacity already enforced every step

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


def kmeans_hierarchical(
    sample,
    n_clusters: int,
    l1: int = 0,
    iters: int = 8,
    l2_iters: int = 5,
    l2_balance_rounds: int = 0,
    l2_balance_ratio: float = 1.3,
    seed: int = 0,
    normalize: bool = False,
) -> jax.Array:
    """Two-level mass-proportional coarse quantizer (the IMI/hierarchical
    move FAISS-style systems use when flat k-means can't find the modes).

    Flat Lloyd on multi-modal corpora leaves a heavy mass tail no matter how
    many balance rounds run (measured at 1M clustered rows: p99 list mass
    5× the spill cap — the recall limiter of bench_ivf_10m round 3). Here:
    level-1 k-means finds `l1` coarse regions, each region gets a LEVEL-2
    centroid budget proportional to its member count (largest-remainder
    rounding, ≥1), and an independent k-means runs inside each region. Mass
    per final list ≈ n/C by construction, independent of how lumpy the
    corpus is. Cost: one small k-means + l1 tiny ones (device steps, host
    loop).
    """
    x = jnp.asarray(sample, jnp.float32)
    n = x.shape[0]
    C = min(n_clusters, n)
    l1 = l1 or max(1, C // 8)
    # Clamp: with l1 > C every live region's floor budget of 1 already sums
    # past C and the trim loop below could never terminate.
    l1 = min(l1, C)
    cent1 = kmeans(x, l1, iters=iters, seed=seed)
    assign1 = np.asarray(_nearest_centroid(x, cent1))
    counts = np.bincount(assign1, minlength=l1)

    # largest-remainder mass-proportional budgets, every live region ≥ 1
    live = counts > 0
    raw = counts / max(1, counts.sum()) * C
    budget = np.maximum(np.floor(raw).astype(int), live.astype(int))
    # trim/pad to exactly C on the largest remainders
    rem = raw - np.floor(raw)
    order = np.argsort(-rem)
    i = 0
    while budget.sum() < C:
        b = order[i % l1]
        if live[b]:
            budget[b] += 1
        i += 1
    order_small = np.argsort(rem)
    i = 0
    while budget.sum() > C:
        b = order_small[i % l1]
        if live[b] and budget[b] > 1:
            budget[b] -= 1
        i += 1
        if i >= 2 * l1 * max(1, int(budget.sum() - C)):
            break  # every live budget at 1 — nothing left to trim

    rng = np.random.default_rng(seed + 1)
    out = []
    x_np = np.asarray(x)
    for c in range(l1):
        if not live[c]:
            continue
        members = np.where(assign1 == c)[0]
        k = int(budget[c])
        if k == 1 or len(members) <= k:
            # degenerate: the region itself (plus member points if the
            # budget exceeds the member count)
            if k <= 1:
                out.append(np.asarray(cent1[c])[None, :])
            else:
                picks = rng.choice(members, min(k, len(members)),
                                   replace=False)
                out.append(x_np[picks])
            continue
        sub = x_np[members]
        # NOTE: l2 balance rounds default to 0 — measured at 1M they
        # RAISED spill drops (289k vs 143k at rounds=4): per-region splits
        # overfit the region sample and the freed centroids land badly
        out.append(np.asarray(kmeans(
            sub, k, iters=l2_iters, seed=seed + 2 + c,
            balance_rounds=l2_balance_rounds,
            balance_ratio=l2_balance_ratio)))
    cent = jnp.asarray(np.concatenate(out, axis=0))
    if cent.shape[0] < C:  # dead-region budget shortfall → random fill
        extra = x_np[rng.choice(n, C - cent.shape[0], replace=False)]
        cent = jnp.concatenate([cent, jnp.asarray(extra)], axis=0)
    if normalize:
        cent = cent / jnp.maximum(
            jnp.linalg.norm(cent, axis=1, keepdims=True), 1e-9)
    return cent
