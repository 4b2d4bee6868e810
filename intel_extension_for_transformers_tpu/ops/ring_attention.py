"""Ring attention: sequence-parallel exact attention over the ICI ring.

Beyond the reference (SURVEY.md §2.3: PP/SP/ring-attention ABSENT in ITREX —
it only *shrinks* long contexts via H2O/sinks/length-adaptive). This is the
real thing: the sequence axis shards over the mesh `sp` axis, each device
holds a T/P query block, and K/V blocks ROTATE around the ring with
`ppermute` while an online-softmax accumulator (the flash-attention merge)
folds each incoming block in. Exact attention over contexts P× longer than
one chip's memory allows; communication is the K/V block per step riding
ICI, overlapped by XLA with the block's attention compute.

Layout: (B, T, H, D) with T sharded. Causal masking uses GLOBAL positions
(each block knows its ring offset), so results are bit-comparable to
single-device attention up to f32 reduction order.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attend(q, k, v, mask, m, l, acc, scale):
    """Online-softmax fold of one K/V block.

    q (B, Tq, H, D); k/v (B, Tk, H, D); mask (Tq, Tk) bool or None;
    m/l (B, H, Tq); acc (B, Tq, H, D) — all f32."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask[None, None], s, -jnp.inf)
    m_blk = jnp.max(s, axis=-1)  # (B, H, Tq)
    m_new = jnp.maximum(m, m_blk)
    # exp of -inf rows (fully masked block) must contribute zero
    p = jnp.exp(s - m_new[..., None])
    p = jnp.where(jnp.isfinite(s), p, 0.0)
    corr = jnp.exp(m - m_new)
    corr = jnp.where(jnp.isfinite(m), corr, 0.0)
    l_new = l * corr + jnp.sum(p, axis=-1)
    pv = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v).astype(jnp.float32)
    acc_new = acc * corr.transpose(0, 2, 1)[..., None] + pv
    return m_new, l_new, acc_new


@partial(jax.jit, static_argnames=("mesh", "axis", "causal"))
def ring_attention(
    q: jax.Array,  # (B, T, H, D), T sharded over `axis`
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "sp",
    causal: bool = True,
) -> jax.Array:
    """→ (B, T, H, D) attention output, T sharded like the inputs."""
    Pn = mesh.shape[axis]
    D = q.shape[-1]
    scale = 1.0 / np.sqrt(D)

    def shard_fn(ql, kl, vl):
        B, Tq, H, Dh = ql.shape
        my = jax.lax.axis_index(axis)
        rowpos = jnp.arange(Tq)
        colpos = jnp.arange(Tq)

        m0 = jnp.full((B, H, Tq), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((B, H, Tq), jnp.float32)
        a0 = jnp.zeros((B, Tq, H, Dh), jnp.float32)

        def body(s, carry):
            kc, vc, m, l, acc = carry
            src_idx = (my - s) % Pn  # ring offset of the current K/V block
            if causal:
                grow = my * Tq + rowpos[:, None]
                gcol = src_idx * Tq + colpos[None, :]
                mask = gcol <= grow
            else:
                mask = None
            m, l, acc = _block_attend(ql, kc, vc, mask, m, l, acc, scale)
            # rotate K/V one step around the ring (device d → d+1)
            perm = [(i, (i + 1) % Pn) for i in range(Pn)]
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
            return kc, vc, m, l, acc

        _, _, m, l, acc = jax.lax.fori_loop(0, Pn, body, (kl, vl, m0, l0, a0))
        l = jnp.maximum(l, 1e-20)
        out = acc / l.transpose(0, 2, 1)[..., None]
        return out.astype(ql.dtype)

    spec = P(None, axis, None, None)
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)
