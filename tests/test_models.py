"""Model forward parity vs HuggingFace torch implementations (CPU).

The strongest correctness evidence we can get without golden files: convert
random-initialized tiny HF models and require logit-level agreement.
(Reference strategy: tiny-model substitution, tests/CI/test_weight_only.py:75.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_hf_bert():
    cfg = transformers.BertConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def tiny_hf_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        max_position_embeddings=128,
    )
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


def test_bert_parity_vs_hf(tiny_hf_bert):
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        bert_params_from_hf,
    )
    from intel_extension_for_transformers_tpu.models import bert_apply

    params, config = bert_params_from_hf(tiny_hf_bert)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 512, size=(2, 16))
    mask = np.ones((2, 16), np.int32)
    mask[1, 10:] = 0

    with torch.no_grad():
        ref = tiny_hf_bert(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    out = np.asarray(
        bert_apply(params, config, jnp.asarray(ids), jnp.asarray(mask))
    )
    # padded positions may differ (we mask keys, HF masks too) — compare valid
    np.testing.assert_allclose(out[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out[1, :10], ref[1, :10], rtol=2e-4, atol=2e-4)


def test_bert_encode_normalized(tiny_hf_bert):
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        bert_params_from_hf,
    )
    from intel_extension_for_transformers_tpu.models import bert_encode

    params, config = bert_params_from_hf(tiny_hf_bert)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 512, size=(3, 12)))
    emb = bert_encode(params, config, ids)
    norms = np.linalg.norm(np.asarray(emb), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_llama_parity_vs_hf(tiny_hf_llama):
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        llama_params_from_hf,
    )
    from intel_extension_for_transformers_tpu.models import llama_apply

    params, config = llama_params_from_hf(tiny_hf_llama)
    ids = np.random.default_rng(2).integers(0, 256, size=(2, 12))

    with torch.no_grad():
        ref = tiny_hf_llama(input_ids=torch.tensor(ids)).logits.numpy()

    out, _ = llama_apply(params, config, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-3, atol=3e-3)


@pytest.mark.parametrize("rope_scaling", [
    {"rope_type": "linear", "factor": 4.0},
    {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 64},
])
def test_llama_rope_scaling_parity_vs_hf(rope_scaling):
    """Long-context RoPE scaling (linear PI + Llama-3.1 'llama3') pins
    logits to the HF torch forward — positions past the original context
    exercise the scaled frequencies."""
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        llama_params_from_hf,
    )
    from intel_extension_for_transformers_tpu.models import llama_apply

    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=256,
        rope_scaling=dict(rope_scaling),
    )
    torch.manual_seed(7)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    params, config = llama_params_from_hf(hf)
    assert config.rope_scaling is not None
    ids = np.random.default_rng(5).integers(0, 256, size=(1, 96))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    out, _ = llama_apply(params, config, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-3, atol=3e-3)


def test_mistral_sliding_window_parity_vs_hf():
    """Sliding-window attention (Mistral) pins logits to HF eager attention
    at T well past the window, full-forward AND cached decode."""
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        llama_params_from_hf,
    )
    from intel_extension_for_transformers_tpu.models import llama_apply
    from intel_extension_for_transformers_tpu.models.llama import init_kv_cache

    cfg = transformers.MistralConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=128,
        sliding_window=8, attn_implementation="eager",
    )
    torch.manual_seed(11)
    hf = transformers.MistralForCausalLM(cfg)
    hf.eval()
    params, config = llama_params_from_hf(hf)
    assert config.sliding_window == 8
    ids = np.random.default_rng(6).integers(0, 256, size=(1, 32))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    out, _ = llama_apply(params, config, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-3, atol=3e-3)
    # the window must actually bite: global attention would differ
    cfg_g = config.__class__(**{**config.__dict__, "sliding_window": None})
    out_g, _ = llama_apply(params, cfg_g, jnp.asarray(ids))
    assert np.abs(np.asarray(out_g) - ref).max() > 1e-2

    # cached prefill+decode matches the full windowed forward
    cache = init_kv_cache(config, 1, 48)
    ids_j = jnp.asarray(ids)
    _, cache = llama_apply(params, config, ids_j[:, :24], cache)
    outs = []
    for t in range(24, 32):
        lg, cache = llama_apply(params, config, ids_j[:, t : t + 1], cache)
        outs.append(np.asarray(lg[0, -1]))
    np.testing.assert_allclose(
        np.stack(outs), ref[0, 24:32], rtol=3e-3, atol=3e-3
    )


def test_llama_kv_cache_decode_matches_full_forward(tiny_hf_llama):
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        llama_params_from_hf,
    )
    from intel_extension_for_transformers_tpu.models import llama_apply
    from intel_extension_for_transformers_tpu.models.llama import init_kv_cache

    params, config = llama_params_from_hf(tiny_hf_llama)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 256, size=(1, 10)))

    # full forward
    full_logits, _ = llama_apply(params, config, ids)

    # prefill 7, then decode 3 one at a time
    cache = init_kv_cache(config, batch=1, max_length=32, dtype=jnp.float32)
    logits, cache = llama_apply(params, config, ids[:, :7], cache)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :7]), rtol=2e-3, atol=2e-3
    )
    for t in range(7, 10):
        step_logits, cache = llama_apply(params, config, ids[:, t : t + 1], cache)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full_logits[:, t]),
            rtol=2e-3,
            atol=2e-3,
        )
    assert int(cache.length) == 10


def test_llama_quantized_forward_close(tiny_hf_llama):
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        llama_params_from_hf,
    )
    from intel_extension_for_transformers_tpu.models import llama_apply
    from intel_extension_for_transformers_tpu.quantization import (
        RtnConfig,
        quantize_model,
    )

    params, config = llama_params_from_hf(tiny_hf_llama)
    qp = quantize_model(params, RtnConfig(weight_dtype="int8", group_size=32))
    assert len(qp.quantized_paths) > 0
    ids = jnp.asarray(np.random.default_rng(4).integers(0, 256, size=(1, 8)))
    ref, _ = llama_apply(params, config, ids)
    out, _ = llama_apply(qp.params, config, ids)
    # int8 g32 quantization should barely move logits
    err = float(jnp.abs(out - ref).mean())
    scale = float(jnp.abs(ref).mean())
    assert err / scale < 0.05, err / scale
