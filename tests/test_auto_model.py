"""Auto-model API tests (pattern: reference tests/CI/test_weight_only.py —
tiny HF model substitution, quantize-load-save-reload parity)."""

import numpy as np
import pytest

import jax.numpy as jnp

from intel_extension_for_transformers_tpu import (
    AutoModel,
    AutoModelForCausalLM,
    OptimizedModel,
    RtnConfig,
)
from intel_extension_for_transformers_tpu.models.auto import (
    TpuCausalLM,
    TpuEncoderModel,
)


@pytest.fixture(scope="module")
def tiny_hf_llama():
    torch = pytest.importorskip("torch")
    import transformers as hf

    cfg = hf.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    return hf.LlamaForCausalLM(cfg)


@pytest.fixture(scope="module")
def tiny_hf_bert():
    torch = pytest.importorskip("torch")
    import transformers as hf

    cfg = hf.BertConfig(
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    return hf.BertModel(cfg)


def test_causal_lm_quantized_forward_parity(tiny_hf_llama):
    """INT4 logits stay close to fp32 logits on a tiny model
    (reference parity check: tests/CI/test_weight_only.py:117)."""
    fp32 = AutoModelForCausalLM.from_hf_model(tiny_hf_llama)
    q = AutoModelForCausalLM.from_hf_model(
        tiny_hf_llama, quantization_config=RtnConfig(weight_dtype="int4", group_size=32)
    )
    ids = np.arange(16, dtype=np.int32)[None, :] % 256
    ref, _ = fp32(ids)
    out, _ = q(ids)
    # int4 drift is bounded; the argmax token should rarely change on logits
    assert np.mean(np.abs(np.asarray(ref) - np.asarray(out))) < 0.15
    assert isinstance(q, TpuCausalLM)
    assert q.quantization_config.weight_dtype == "int4"


def test_causal_lm_generate(tiny_hf_llama):
    model = AutoModelForCausalLM.from_hf_model(tiny_hf_llama, load_in_8bit=True)
    from intel_extension_for_transformers_tpu.models.generation import SamplingConfig

    out = model.generate(
        np.arange(8, dtype=np.int32) % 256,
        SamplingConfig(max_new_tokens=4, temperature=0.0),
    )
    assert out.shape == (1, 4)


def test_save_load_low_bit_roundtrip(tiny_hf_llama, tmp_path):
    """save_low_bit → load_low_bit → identical logits (reference:
    modeling_auto.py:209,1312)."""
    q = AutoModelForCausalLM.from_hf_model(tiny_hf_llama, load_in_4bit=True)
    d = str(tmp_path / "m")
    q.save_low_bit(d)
    r = AutoModelForCausalLM.from_pretrained(d)
    ids = np.arange(12, dtype=np.int32)[None, :] % 256
    a, _ = q(ids)
    b, _ = r(ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # OptimizedModel reloads the same thing transparently
    o = OptimizedModel.from_pretrained(d)
    assert isinstance(o, TpuCausalLM)


def test_encoder_roundtrip(tiny_hf_bert, tmp_path):
    enc = AutoModel.from_hf_model(
        tiny_hf_bert, quantization_config=RtnConfig(weight_dtype="int8", group_size=32)
    )
    assert isinstance(enc, TpuEncoderModel)
    ids = np.arange(10, dtype=np.int32)[None, :] % 256
    emb = enc.encode(ids)
    assert emb.shape == (1, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb, np.float32), axis=-1), 1.0, atol=1e-3
    )
    d = str(tmp_path / "e")
    enc.save_low_bit(d)
    r = OptimizedModel.from_pretrained(d)
    assert isinstance(r, TpuEncoderModel)
    emb2 = r.encode(ids)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2), atol=1e-5)


def test_unquantized_save_load(tiny_hf_llama, tmp_path):
    m = AutoModelForCausalLM.from_hf_model(tiny_hf_llama)
    d = str(tmp_path / "fp")
    m.save_low_bit(d)
    r = AutoModelForCausalLM.from_pretrained(d)
    ids = np.arange(6, dtype=np.int32)[None, :] % 256
    a, _ = m(ids)
    b, _ = r(ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
