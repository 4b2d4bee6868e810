"""TTS tests (the last media plugin; reference: pipeline/plugins/audio/tts.py).

The Griffin-Lim vocoder is pure DSP, so its quality is testable WITHOUT
trained weights: a tone's log-mel must survive a mel→wav→mel round trip with
high correlation. The mel generator is structure/determinism tested."""

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.tts import (
    TTSConfig,
    griffin_lim,
    tts_apply,
    tts_init_params,
)
from intel_extension_for_transformers_tpu.models.whisper import (
    log_mel_spectrogram,
)


def test_griffin_lim_round_trip():
    sr = 16000
    t = np.arange(sr) / sr
    tone = (
        0.6 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 880 * t)
    ).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(tone))  # whisper-normalized
    raw = mel.T * 4.0 - 4.0  # back to raw log10 power
    wav = np.asarray(griffin_lim(jnp.asarray(raw), iters=32))
    assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0 + 1e-5
    mel2 = np.asarray(log_mel_spectrogram(wav[: len(tone)]))
    T = min(mel.shape[1], mel2.shape[1])
    corr = np.corrcoef(mel[:, :T].ravel(), mel2[:, :T].ravel())[0, 1]
    assert corr > 0.8, corr


def test_tts_model_shapes_and_determinism():
    cfg = TTSConfig.test()
    params = tts_init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(
        np.frombuffer(b"hello tpu", np.uint8).astype(np.int32)[None]
    )
    mel, total, dur = tts_apply(params, cfg, ids)
    assert mel.shape == (1, cfg.max_frames, cfg.n_mels)
    assert 1 <= int(total[0]) <= cfg.max_frames
    assert np.all(np.asarray(dur) >= 0)
    mel2, _, _ = tts_apply(params, cfg, ids)
    np.testing.assert_array_equal(np.asarray(mel), np.asarray(mel2))


def test_tts_plugin_end_to_end():
    from intel_extension_for_transformers_tpu.neural_chat.chat_plugins import (
        TtsPlugin,
    )

    cfg = TTSConfig.test()
    params = tts_init_params(jax.random.PRNGKey(1), cfg)
    plugin = TtsPlugin(preloaded=(params, cfg), vocoder_iters=4)
    wav, sr = plugin.text2speech("hello world")
    assert sr == 16000
    assert wav.ndim == 1 and len(wav) > 0 and np.isfinite(wav).all()
    assert plugin.post_llm_inference_actions("text") == "text"


def test_tts_plugin_registered_in_chatbot():
    from intel_extension_for_transformers_tpu.models.llama import (
        LlamaConfig,
        llama_init_params,
    )
    from intel_extension_for_transformers_tpu.models.tokenization import (
        ByteTokenizer,
    )
    from intel_extension_for_transformers_tpu.neural_chat.chatbot import (
        build_chatbot,
    )
    from intel_extension_for_transformers_tpu.neural_chat.config import (
        LoadingModelConfig,
        PipelineConfig,
    )
    from intel_extension_for_transformers_tpu.neural_chat.plugins import (
        get_plugin_instance,
        reset_plugins,
    )

    reset_plugins()
    config = LlamaConfig.tiny()
    params = llama_init_params(jax.random.PRNGKey(0), config)
    cfg = TTSConfig.test()
    tparams = tts_init_params(jax.random.PRNGKey(1), cfg)
    bot = build_chatbot(
        PipelineConfig(
            model_name_or_path="tiny",
            loading_config=LoadingModelConfig(
                preloaded=(params, config, ByteTokenizer())
            ),
            plugins={"tts": {"preloaded": (tparams, cfg), "vocoder_iters": 2}},
        )
    )
    assert bot is not None
    tts = get_plugin_instance("tts")
    assert tts is not None
    wav, _ = tts.text2speech("ok")
    assert len(wav) > 0
    reset_plugins()
