"""Mixtral-family MoE tests: HF logits parity, routing sanity, generation,
expert sharding (reference coverage: mixtral via the gaudi port +
neural-speed graphs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers as hf  # noqa: E402

from intel_extension_for_transformers_tpu.models.llama import (  # noqa: E402
    LlamaConfig,
    llama_apply,
    llama_init_params,
    llama_param_axes,
)
from intel_extension_for_transformers_tpu.models.hf_convert import (  # noqa: E402
    llama_params_from_hf,
)

MOE_CFG = LlamaConfig.tiny(
    vocab_size=64,
    max_position_embeddings=64,
    num_local_experts=4,
    num_experts_per_tok=2,
)


def test_mixtral_parity_vs_hf():
    cfg = hf.MixtralConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=96,
        max_position_embeddings=64,
        num_local_experts=4,
        num_experts_per_tok=2,
    )
    torch.manual_seed(0)
    m = hf.MixtralForCausalLM(cfg)
    m.eval()
    params, config = llama_params_from_hf(m)
    assert config.num_local_experts == 4
    ids = np.random.default_rng(0).integers(0, 128, (2, 12)).astype(np.int64)
    with torch.no_grad():
        ref = m(torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(
        llama_apply(params, config, jnp.asarray(ids, jnp.int32))[0], np.float32
    )
    err = np.abs(
        (ref - ref.max(-1, keepdims=True)) - (got - got.max(-1, keepdims=True))
    ).max()
    assert err < 0.05, err


def test_moe_forward_and_cache_consistency():
    params = llama_init_params(jax.random.PRNGKey(0), MOE_CFG)
    from intel_extension_for_transformers_tpu.models.llama import init_kv_cache

    ids = jnp.asarray(np.arange(10, dtype=np.int32)[None, :] % 64)
    full, _ = llama_apply(params, MOE_CFG, ids)
    cache = init_kv_cache(MOE_CFG, 1, 16)
    _, cache = llama_apply(params, MOE_CFG, ids[:, :9], cache)
    last, _ = llama_apply(params, MOE_CFG, ids[:, 9:], cache)
    np.testing.assert_allclose(
        np.asarray(full[:, -1]), np.asarray(last[:, -1]), rtol=2e-3, atol=2e-3
    )


def test_moe_generate():
    from intel_extension_for_transformers_tpu.models.generation import (
        SamplingConfig,
        generate,
    )

    params = llama_init_params(jax.random.PRNGKey(0), MOE_CFG)
    out = generate(
        params, MOE_CFG, np.arange(6, dtype=np.int32) % 64,
        SamplingConfig(max_new_tokens=5, do_sample=False, temperature=0.0,
                       repetition_penalty=1.0),
    )
    assert out.shape == (1, 5)


def test_moe_expert_sharding():
    """Expert dim shards over ep; forward stays numerically identical."""
    from intel_extension_for_transformers_tpu.parallel import (
        create_mesh,
        shard_params,
    )

    params = llama_init_params(jax.random.PRNGKey(0), MOE_CFG)
    mesh = create_mesh(dp=2, ep=4)
    sharded = shard_params(params, llama_param_axes(MOE_CFG), mesh)
    g = sharded["layers"][0]["mlp"]["experts"]["gate"]
    assert not g.sharding.is_fully_replicated
    ids = jnp.asarray(np.arange(8, dtype=np.int32)[None, :] % 64)
    ref, _ = llama_apply(params, MOE_CFG, ids)
    got, _ = llama_apply(sharded, MOE_CFG, ids)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-4,
                               rtol=2e-4)


def test_moe_expert_weight_only_quantization():
    """WOQ now covers 3-D expert stacks (COVERAGE.md round-2 queue #5):
    quantized-MoE logits must track fp32 within RTN tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from intel_extension_for_transformers_tpu.models.llama import (
        LlamaConfig,
        llama_apply,
        llama_init_params,
    )
    from intel_extension_for_transformers_tpu.quantization import (
        RtnConfig,
        quantize_model,
    )

    config = LlamaConfig.tiny(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_local_experts=4, num_experts_per_tok=2,
    )
    params = llama_init_params(jax.random.PRNGKey(0), config)
    q = quantize_model(params, RtnConfig(weight_dtype="int4", group_size=32))
    # the expert stacks themselves got packed
    assert any("experts" in p for p in q.quantized_paths), q.quantized_paths

    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 128, (2, 16)), jnp.int32
    )
    ref, _ = llama_apply(params, config, ids)
    got, _ = llama_apply(q.params, config, ids)
    ref = np.asarray(ref) - np.asarray(ref).max(-1, keepdims=True)
    got = np.asarray(got) - np.asarray(got).max(-1, keepdims=True)
    # int4 g32 RTN tolerance on a tiny random model
    assert np.abs(ref - got).mean() < 0.5


def test_moe_gathered_decode_parity():
    """The M·k<E decode branch gathers ONLY the selected experts' packed
    blocks (k/E of the dense-all-experts HBM traffic). It must produce the
    same logits as the full-sequence (ragged) path — fp32 AND int4 expert
    stacks — via a cached single-token decode, which lands at M=1."""
    from intel_extension_for_transformers_tpu.models.llama import (
        init_kv_cache,
    )
    from intel_extension_for_transformers_tpu.quantization import (
        RtnConfig,
        quantize_model,
    )

    cfg = LlamaConfig.tiny(
        vocab_size=64, max_position_embeddings=64,
        num_local_experts=4, num_experts_per_tok=2,
    )
    ids = jnp.asarray(np.arange(12, dtype=np.int32)[None, :] % 64)

    for quantized in (False, True):
        params = llama_init_params(jax.random.PRNGKey(1), cfg)
        if quantized:
            params = quantize_model(
                params, RtnConfig(weight_dtype="int4", group_size=16)
            ).params
        full, _ = llama_apply(params, cfg, ids)          # ragged path, M=24
        cache = init_kv_cache(cfg, 1, 16)
        _, cache = llama_apply(params, cfg, ids[:, :11], cache)
        last, _ = llama_apply(params, cfg, ids[:, 11:], cache)  # M=1 gather
        np.testing.assert_allclose(
            np.asarray(full[:, -1]), np.asarray(last[:, -1]),
            rtol=2e-3, atol=2e-3,
        )
