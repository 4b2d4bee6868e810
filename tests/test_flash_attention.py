"""Flash attention parity vs the plain XLA attention (ref-kernel comparison,
the strategy of reference SparseLib mha_dense_ref)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.ops.flash_attention import (
    flash_attention,
)
from intel_extension_for_transformers_tpu.ops.layers import (
    attention,
    make_causal_mask,
)


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32) * 0.5
    )


@pytest.mark.parametrize("T", [128, 256, 300])
def test_causal_parity(T):
    B, H, D = 2, 4, 64
    q = _rand((B, T, H, D), 0)
    k = _rand((B, T, H, D), 1)
    v = _rand((B, T, H, D), 2)
    ref = attention(q, k, v, mask=make_causal_mask(T, T))
    got = flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3,
                               rtol=2e-3)


def test_non_causal_parity():
    B, T, S, H, D = 1, 64, 192, 2, 64
    q = _rand((B, T, H, D), 0)
    k = _rand((B, S, H, D), 1)
    v = _rand((B, S, H, D), 2)
    ref = attention(q, k, v)
    got = flash_attention(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3,
                               rtol=2e-3)


def test_gqa_parity():
    B, T, H, Hkv, D = 1, 128, 8, 2, 64
    q = _rand((B, T, H, D), 0)
    k = _rand((B, T, Hkv, D), 1)
    v = _rand((B, T, Hkv, D), 2)
    ref = attention(q, k, v, mask=make_causal_mask(T, T))
    got = flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3,
                               rtol=2e-3)


def test_unpadded_kv_mask():
    """Keys beyond the true S (block padding) must not leak."""
    B, H, D = 1, 2, 64
    q = _rand((B, 100, H, D), 0)
    k = _rand((B, 100, H, D), 1)
    v = _rand((B, 100, H, D), 2)
    ref = attention(q, k, v, mask=make_causal_mask(100, 100))
    got = flash_attention(q, k, v, causal=True, block_q=64, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3,
                               rtol=2e-3)


def test_chunked_prefill_offset():
    """q_offset makes chunked prefill equal one-shot attention."""
    B, T, H, D = 1, 256, 2, 64
    q = _rand((B, T, H, D), 0)
    k = _rand((B, T, H, D), 1)
    v = _rand((B, T, H, D), 2)
    full = flash_attention(q, k, v, causal=True)
    half = T // 2
    part1 = flash_attention(q[:, :half], k[:, :half], v[:, :half], causal=True)
    part2 = flash_attention(q[:, half:], k, v, causal=True, q_offset=half)
    got = jnp.concatenate([part1, part2], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=2e-3,
                               rtol=2e-3)


def test_bfloat16():
    B, T, H, D = 1, 128, 2, 64
    q = _rand((B, T, H, D), 0).astype(jnp.bfloat16)
    k = _rand((B, T, H, D), 1).astype(jnp.bfloat16)
    v = _rand((B, T, H, D), 2).astype(jnp.bfloat16)
    ref = attention(q, k, v, mask=make_causal_mask(T, T))
    got = flash_attention(q, k, v, causal=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_llama_long_context_flash_routing():
    """llama_apply at T>=1024 (no cache, no padding) routes through flash and
    matches the masked-attention path numerically."""
    import os

    from intel_extension_for_transformers_tpu.models.llama import (
        LlamaConfig,
        llama_apply,
        llama_init_params,
    )

    cfg = LlamaConfig.tiny(max_position_embeddings=2048)
    params = llama_init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 1024)),
        jnp.int32,
    )
    flash_logits, _ = llama_apply(params, cfg, ids)
    os.environ["ITX_DISABLE_FLASH"] = "1"
    try:
        # different env → must retrace; new config object forces it
        ref_logits, _ = llama_apply(
            params, LlamaConfig.tiny(max_position_embeddings=2048,
                                     rope_theta=10000.0 + 1e-9), ids
        )
    finally:
        del os.environ["ITX_DISABLE_FLASH"]
    np.testing.assert_allclose(
        np.asarray(flash_logits), np.asarray(ref_logits), atol=5e-2, rtol=5e-2
    )
