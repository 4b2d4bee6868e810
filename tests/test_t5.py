"""T5 seq2seq tests: logits parity vs HF torch forward, generation
(reference: AutoModelForSeq2SeqLM export, transformers/__init__.py:49)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers as hf  # noqa: E402

from intel_extension_for_transformers_tpu.models.t5 import (  # noqa: E402
    T5Config,
    t5_apply,
    t5_generate,
    t5_init_params,
    t5_params_from_hf,
)


def _tiny_hf(feed_forward_proj="relu", tie=True):
    cfg = hf.T5Config(
        vocab_size=256,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=32,
        feed_forward_proj=feed_forward_proj,
        tie_word_embeddings=tie,
        decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    return hf.T5ForConditionalGeneration(cfg)


@pytest.mark.parametrize("proj,tie", [("relu", True), ("gated-gelu", False)])
def test_t5_parity(proj, tie):
    m = _tiny_hf(proj, tie)
    m.eval()
    params, config = t5_params_from_hf(m)
    rng = np.random.default_rng(0)
    enc_ids = rng.integers(0, 256, (2, 10)).astype(np.int64)
    dec_ids = rng.integers(0, 256, (2, 6)).astype(np.int64)
    with torch.no_grad():
        ref = m(
            input_ids=torch.tensor(enc_ids),
            decoder_input_ids=torch.tensor(dec_ids),
        ).logits.float().numpy()
    got = np.asarray(
        t5_apply(
            params,
            config,
            jnp.asarray(enc_ids, jnp.int32),
            jnp.asarray(dec_ids, jnp.int32),
        ),
        np.float32,
    )
    ref_l = ref - ref.max(-1, keepdims=True)
    got_l = got - got.max(-1, keepdims=True)
    err = np.abs(ref_l - got_l).max()
    assert err < 0.05, (proj, tie, err)


def test_t5_encoder_mask_parity():
    m = _tiny_hf()
    m.eval()
    params, config = t5_params_from_hf(m)
    rng = np.random.default_rng(1)
    enc_ids = rng.integers(0, 256, (2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    mask[1, 6:] = 0
    dec_ids = rng.integers(0, 256, (2, 4)).astype(np.int64)
    with torch.no_grad():
        ref = m(
            input_ids=torch.tensor(enc_ids),
            attention_mask=torch.tensor(mask),
            decoder_input_ids=torch.tensor(dec_ids),
        ).logits.float().numpy()
    got = np.asarray(
        t5_apply(
            params,
            config,
            jnp.asarray(enc_ids, jnp.int32),
            jnp.asarray(dec_ids, jnp.int32),
            attention_mask=jnp.asarray(mask, jnp.int32),
        )
    )
    err = np.abs(
        (ref - ref.max(-1, keepdims=True)) - (got - got.max(-1, keepdims=True))
    ).max()
    assert err < 0.05, err


def test_t5_greedy_generate_matches_hf():
    m = _tiny_hf()
    m.eval()
    params, config = t5_params_from_hf(m)
    enc_ids = np.arange(8, dtype=np.int64)[None, :] % 256
    with torch.no_grad():
        ref = m.generate(
            torch.tensor(enc_ids), max_new_tokens=8, do_sample=False,
            num_beams=1, eos_token_id=None, pad_token_id=0,
        ).numpy()
    got = t5_generate(
        params, config, enc_ids.astype(np.int32), max_new_tokens=8,
        eos_token_id=None,
    )
    # HF output includes the decoder_start token; ours is generated-only
    np.testing.assert_array_equal(ref[0, 1:], got[0])


def test_t5_init_and_quantize():
    from intel_extension_for_transformers_tpu.quantization import (
        RtnConfig,
        quantize_model,
    )

    config = T5Config.tiny()
    params = t5_init_params(jax.random.PRNGKey(0), config)
    ids = jnp.arange(8, dtype=jnp.int32)[None, :]
    dec = jnp.arange(4, dtype=jnp.int32)[None, :]
    ref = t5_apply(params, config, ids, dec)
    qp = quantize_model(params, RtnConfig(weight_dtype="int8", group_size=32))
    assert qp.quantized_paths
    got = t5_apply(qp.params, config, ids, dec)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05, rel


def test_auto_seq2seq_roundtrip(tmp_path):
    from intel_extension_for_transformers_tpu import (
        AutoModelForSeq2SeqLM,
        OptimizedModel,
        RtnConfig,
    )

    m = AutoModelForSeq2SeqLM.from_hf_model(
        _tiny_hf(), quantization_config=RtnConfig(weight_dtype="int8",
                                                  group_size=16)
    )
    enc = np.arange(8, dtype=np.int32)[None, :]
    dec = np.arange(4, dtype=np.int32)[None, :]
    a = m(enc, dec)
    d = str(tmp_path / "t5")
    m.save_low_bit(d)
    r = OptimizedModel.from_pretrained(d)
    b = r(enc, dec)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    out = r.generate(enc, max_new_tokens=4, eos_token_id=None)
    assert out.shape == (1, 4)
