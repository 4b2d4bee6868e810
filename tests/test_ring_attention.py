"""Ring-attention SP tests: exactness vs single-device attention on the
8-device CPU mesh (beyond the reference — SURVEY.md §2.3 lists SP/ring as
ABSENT in ITREX)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.ops.ring_attention import (
    ring_attention,
)


def _ref_attention(q, k, v, causal):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    s = s / np.sqrt(q.shape[-1])
    if causal:
        T = q.shape[1]
        mask = jnp.tril(jnp.ones((T, T), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v)


@pytest.fixture(scope="module")
def sp_mesh():
    from intel_extension_for_transformers_tpu.parallel import create_mesh

    return create_mesh(sp=8)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_full(sp_mesh, causal):
    rng = np.random.default_rng(0)
    B, T, H, D = 2, 64, 4, 16  # T shards 8 ways → 8-token blocks
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    ref = np.asarray(_ref_attention(q, k, v, causal))
    got = np.asarray(
        ring_attention(q, k, v, mesh=sp_mesh, axis="sp", causal=causal)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_ring_attention_output_stays_sharded(sp_mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(1)
    B, T, H, D = 1, 32, 2, 8
    mk = lambda: jax.device_put(  # noqa: E731
        jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32),
        NamedSharding(sp_mesh, P(None, "sp", None, None)),
    )
    out = ring_attention(mk(), mk(), mk(), mesh=sp_mesh, axis="sp")
    assert out.shape == (B, T, H, D)
    # the sequence axis must remain distributed (no gather to one device)
    assert len(out.sharding.device_set) == 8
