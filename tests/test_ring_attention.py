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


def test_llama_forward_with_ring_sp_matches_plain(sp_mesh):
    """Full llama_apply(ring_mesh=...) training forward == plain forward.

    GQA config (2 kv heads repeated to 4 q heads) so the repeat-KV path in
    the ring branch is exercised too."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from intel_extension_for_transformers_tpu.models.llama import (
        LlamaConfig,
        llama_apply,
        llama_init_params,
    )

    config = LlamaConfig.tiny(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
    )
    params = llama_init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 64)), jnp.int32)

    ref, _ = llama_apply(params, config, ids)

    ids_sp = jax.device_put(ids, NamedSharding(sp_mesh, P(None, "sp")))
    got, _ = llama_apply(params, config, ids_sp, ring_mesh=sp_mesh)
    # sequence axis stays distributed end to end
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_llama_ring_sp_rejects_cache_and_mask(sp_mesh):
    from intel_extension_for_transformers_tpu.models.llama import (
        LlamaConfig,
        llama_apply,
        llama_init_params,
    )

    config = LlamaConfig.tiny(vocab_size=64, hidden_size=32, intermediate_size=64)
    params = llama_init_params(jax.random.PRNGKey(0), config)
    ids = jnp.zeros((1, 16), jnp.int32)
    with pytest.raises(ValueError, match="ring-attention"):
        llama_apply(
            params, config, ids,
            attention_mask=jnp.ones((1, 16), jnp.int32),
            ring_mesh=sp_mesh,
        )


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
