"""Whisper-class ASR tests (VERDICT.md round-1 missing #5 / next-round #10;
reference: pipeline/plugins/audio/asr.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers as hf  # noqa: E402

from intel_extension_for_transformers_tpu.models.whisper import (  # noqa: E402
    WhisperConfig,
    log_mel_spectrogram,
    whisper_decode_logits,
    whisper_encode,
    whisper_generate,
    whisper_init_params,
    whisper_params_from_hf,
)


@pytest.fixture(scope="module")
def hf_pair():
    hc = hf.WhisperConfig(
        vocab_size=128, num_mel_bins=16, d_model=32, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_source_positions=50,
        max_target_positions=32, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=1,
    )
    torch.manual_seed(0)
    model = hf.WhisperForConditionalGeneration(hc).eval()
    params, cfg = whisper_params_from_hf(model)
    return model, params, cfg


def test_whisper_logits_parity(hf_pair):
    model, params, cfg = hf_pair
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(2, 16, 100)).astype(np.float32)
    dec = rng.integers(0, cfg.vocab_size, (2, 7)).astype(np.int64)
    with torch.no_grad():
        ref = model(
            input_features=torch.tensor(mel),
            decoder_input_ids=torch.tensor(dec),
        ).logits.numpy()
    enc = whisper_encode(params, cfg, jnp.asarray(mel))
    got = np.asarray(
        whisper_decode_logits(params, cfg, jnp.asarray(dec, jnp.int32), enc)
    )
    rl = ref - ref.max(-1, keepdims=True)
    gl = got - got.max(-1, keepdims=True)
    assert np.abs(rl - gl).max() < 0.01


def test_mel_frontend_matches_hf():
    """Our jnp FFT log-mel must match WhisperFeatureExtractor numerics."""
    fe = hf.WhisperFeatureExtractor(feature_size=80)
    audio = np.random.default_rng(1).normal(size=(16000,)).astype(np.float32) * 0.1
    ref = fe(audio, sampling_rate=16000, return_tensors="np", padding=False)[
        "input_features"
    ][0]
    got = np.asarray(log_mel_spectrogram(audio))
    assert got.shape == ref.shape
    assert np.abs(ref - got).max() < 1e-4


def test_whisper_greedy_matches_hf_generate(hf_pair):
    model, params, cfg = hf_pair
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(1, 16, 100)).astype(np.float32)
    # manual greedy loop through the HF forward (model.generate injects
    # whisper-specific logits processors that are out of scope here)
    dec = [1]
    with torch.no_grad():
        for _ in range(8):
            logits = model(
                input_features=torch.tensor(mel),
                decoder_input_ids=torch.tensor([dec]),
            ).logits
            nxt = int(logits[0, -1].argmax())
            dec.append(nxt)
            if nxt == 2:
                break
    ref_tail = np.array(dec[1:])
    got = whisper_generate(
        params, cfg, mel, np.array([[1]], np.int32), max_new_tokens=8,
        eos_token_id=2,
    )[0]
    n = min(len(got), len(ref_tail))
    np.testing.assert_array_equal(ref_tail[:n], got[:n])
    assert n >= 4


def test_asr_plugin_end_to_end():
    from intel_extension_for_transformers_tpu.models.tokenization import (
        ByteTokenizer,
    )
    from intel_extension_for_transformers_tpu.neural_chat.chat_plugins import (
        AsrPlugin,
    )

    cfg = WhisperConfig.test()
    params = whisper_init_params(jax.random.PRNGKey(0), cfg)
    plugin = AsrPlugin(
        preloaded=(params, cfg, ByteTokenizer()),
        prompt_ids=(65,),
        max_new_tokens=6,
    )
    audio = np.sin(np.linspace(0, 440 * 2 * np.pi, 8000)).astype(np.float32)
    text = plugin.audio2text(audio)
    assert isinstance(text, str)
    # pre-hook protocol: strings pass through untouched
    assert plugin.pre_llm_inference_actions("hello") == "hello"

    # LONG-FORM: audio past the encoder window transcribes in sequential
    # chunks through the same compiled programs (no truncation)
    window = cfg.max_source_positions * 2 * 160
    long_audio = np.tile(audio, (3 * window) // len(audio) + 1)[: 3 * window]
    long_text = plugin.audio2text(long_audio)
    assert isinstance(long_text, str)
    # each chunk contributes: the joined text repeats the single-window text
    assert long_text.count(text.strip()) >= 2 if text.strip() else True


def test_whisper_generate_compiled_matches_host_loop():
    """The one-program fori_loop transcription equals the host greedy loop
    (no-EOS) — the zero-dispatch serving/benchmark path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from intel_extension_for_transformers_tpu.models.whisper import (
        WhisperConfig,
        whisper_generate,
        whisper_generate_compiled,
        whisper_init_params,
    )

    cfg = WhisperConfig.test()
    params = whisper_init_params(jax.random.PRNGKey(0), cfg)
    mel = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (2, cfg.num_mel_bins, 100))
    )
    prompt = np.array([[1, 2], [3, 4]], np.int32)
    ref = whisper_generate(params, cfg, mel, prompt, max_new_tokens=8)
    got = whisper_generate_compiled(
        params, cfg, jnp.asarray(mel), jnp.asarray(prompt), 2,
        max_new_tokens=8,
    )
    np.testing.assert_array_equal(ref, np.asarray(got))
