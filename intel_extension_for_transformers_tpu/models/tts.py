"""Text-to-speech: FastSpeech-style mel generator + Griffin-Lim vocoder.

Re-creation of the reference's TTS plugin role (reference:
neural_chat/pipeline/plugins/audio/tts.py — SpeechT5/bert_vits2 pipelines)
with a TPU-native non-autoregressive design:

- `tts_apply`: char/phoneme embeddings → transformer encoder → duration
  predictor → STATIC-shape length regulation (cumsum-gather expansion to a
  fixed frame budget — no dynamic shapes under jit) → decoder → (frames, 80)
  log-mel. Weights come from `tts_init_params` (random) or a trained
  checkpoint; the architecture is FastSpeech-lite.
- `griffin_lim`: mel → waveform. Pure DSP (pseudo-inverse mel filterbank +
  iterative phase recovery on jnp FFTs, the whole loop one jitted
  `lax.fori_loop`) — fully functional and testable without any weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.whisper import _mel_filterbank


@dataclass(frozen=True)
class TTSConfig:
    vocab_size: int = 256  # byte/char input
    d_model: int = 256
    encoder_layers: int = 4
    decoder_layers: int = 4
    num_heads: int = 4
    ffn_dim: int = 1024
    n_mels: int = 80
    max_text_len: int = 256
    max_frames: int = 1024

    @classmethod
    def test(cls) -> "TTSConfig":
        return cls(
            d_model=32, encoder_layers=1, decoder_layers=1, num_heads=2,
            ffn_dim=64, n_mels=20, max_text_len=32, max_frames=64,
        )


def _ln(x, p, eps=1e-5):
    m = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), -1, keepdims=True)
    y = ((x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + eps)).astype(x.dtype)
    return y * p["scale"] + p["bias"]


def _dense(x, p):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _block(x, p, nh, mask=None):
    B, L, D = x.shape
    hd = D // nh
    h = _ln(x, p["ln1"])
    q = _dense(h, p["q"]).reshape(B, L, nh, hd)
    k = _dense(h, p["k"]).reshape(B, L, nh, hd)
    v = _dense(h, p["v"]).reshape(B, L, nh, hd)
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    if mask is not None:
        att = jnp.where(mask[:, None, None, :], att, -jnp.inf)
    att = jax.nn.softmax(att.astype(jnp.float32), -1).astype(x.dtype)
    x = x + _dense(jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, L, D), p["o"])
    h = _ln(x, p["ln2"])
    return x + _dense(jax.nn.relu(_dense(h, p["fc1"])), p["fc2"])


def _sinpos(L, D):
    inv = np.exp(-np.log(10000.0) * np.arange(0, D, 2) / D)
    ang = np.arange(L)[:, None] * inv[None, :]
    pe = np.zeros((L, D), np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return jnp.asarray(pe)


@partial(jax.jit, static_argnames=("cfg",))
def tts_apply(params, cfg: TTSConfig, text_ids, text_mask=None):
    """text_ids (B, Lt) → (mel (B, max_frames, n_mels), frame_count (B,),
    durations (B, Lt)). Length regulation is static: each output frame
    gathers its source token via searchsorted on the duration cumsum."""
    B, Lt = text_ids.shape
    if text_mask is None:
        text_mask = jnp.ones((B, Lt), bool)
    x = jnp.take(params["embed"], text_ids, axis=0) + _sinpos(Lt, cfg.d_model)[None]
    for p in params["encoder"]:
        x = _block(x, p, cfg.num_heads, mask=text_mask)
    # duration predictor (log-domain, clamped)
    d = _dense(jax.nn.relu(_dense(x, params["dur1"])), params["dur2"])[..., 0]
    dur = jnp.clip(jnp.exp(d) - 1.0, 1.0, 32.0) * text_mask  # (B, Lt) frames
    cum = jnp.cumsum(dur, axis=1)  # (B, Lt)
    total = jnp.minimum(cum[:, -1], cfg.max_frames).astype(jnp.int32)
    # frame f sources token argmin{t: cum[t] > f} — vectorized searchsorted
    frames = jnp.arange(cfg.max_frames, dtype=jnp.float32)[None, :]
    src = jnp.sum(cum[:, None, :] <= frames[:, :, None], axis=-1)  # (B, F)
    src = jnp.minimum(src, Lt - 1)
    y = jnp.take_along_axis(x, src[..., None], axis=1)  # (B, F, D)
    y = y + _sinpos(cfg.max_frames, cfg.d_model)[None]
    fmask = frames[0][None, :] < total[:, None]
    for p in params["decoder"]:
        y = _block(y, p, cfg.num_heads, mask=fmask)
    mel = _dense(_ln(y, params["ln_out"]), params["mel_out"])
    return mel, total, dur


def tts_init_params(key, cfg: TTSConfig) -> dict:
    keys = iter(jax.random.split(key, 512))
    D = cfg.d_model

    def dense(cin, cout, scale=1.0):
        return {
            "kernel": jax.random.normal(next(keys), (cin, cout), jnp.float32)
            * scale / np.sqrt(cin),
            "bias": jnp.zeros((cout,), jnp.float32),
        }

    def ln():
        return {"scale": jnp.ones((D,), jnp.float32),
                "bias": jnp.zeros((D,), jnp.float32)}

    def block():
        return {
            "ln1": ln(), "q": dense(D, D), "k": dense(D, D), "v": dense(D, D),
            "o": dense(D, D, 0.3), "ln2": ln(),
            "fc1": dense(D, cfg.ffn_dim), "fc2": dense(cfg.ffn_dim, D, 0.3),
        }

    return {
        "embed": jax.random.normal(next(keys), (cfg.vocab_size, D)) * 0.02,
        "encoder": [block() for _ in range(cfg.encoder_layers)],
        "decoder": [block() for _ in range(cfg.decoder_layers)],
        "dur1": dense(D, D),
        "dur2": dense(D, 1),
        "ln_out": ln(),
        "mel_out": dense(D, cfg.n_mels, 0.3),
    }


# ------------------------------ Griffin-Lim ------------------------------


@partial(jax.jit, static_argnames=("n_fft", "hop", "iters", "sr", "n_mels"))
def griffin_lim(
    log_mel: jnp.ndarray,  # (frames, n_mels) — log10 power mel
    *,
    n_fft: int = 400,
    hop: int = 160,
    sr: int = 16000,
    iters: int = 32,
    n_mels: int = 80,
) -> jnp.ndarray:
    """log-mel → waveform via mel pseudo-inverse + Griffin-Lim phase
    recovery (whole iteration loop one jitted program)."""
    mel_fb = jnp.asarray(_mel_filterbank(sr, n_fft, n_mels))  # (M, F)
    power = jnp.power(10.0, log_mel.astype(jnp.float32))  # (T, M)
    # pseudo-inverse projection back to the linear spectrogram, clamped
    pinv = jnp.linalg.pinv(mel_fb)  # (F, M)
    spec = jnp.maximum(power @ pinv.T, 1e-10)  # (T, F) power
    mag = jnp.sqrt(spec)

    T = mag.shape[0]
    win = jnp.hanning(n_fft + 1)[:-1]
    out_len = n_fft + hop * (T - 1)

    def istft(cspec):
        frames = jnp.fft.irfft(cspec, n=n_fft, axis=-1) * win[None, :]
        idx = jnp.arange(T)[:, None] * hop + jnp.arange(n_fft)[None, :]
        wav = jnp.zeros((out_len,), jnp.float32).at[idx.reshape(-1)].add(
            frames.reshape(-1)
        )
        norm = jnp.zeros((out_len,), jnp.float32).at[idx.reshape(-1)].add(
            jnp.tile(win * win, (T,))
        )
        return wav / jnp.maximum(norm, 1e-8)

    def stft(wav):
        idx = jnp.arange(T)[:, None] * hop + jnp.arange(n_fft)[None, :]
        return jnp.fft.rfft(wav[idx] * win[None, :], axis=-1)

    def body(_, carry):
        angles = carry
        wav = istft(mag * angles)
        re = stft(wav)
        return re / jnp.maximum(jnp.abs(re), 1e-8)

    angles0 = jnp.exp(
        2j * jnp.pi * jax.random.uniform(jax.random.PRNGKey(0), mag.shape)
    ).astype(jnp.complex64)
    angles = jax.lax.fori_loop(0, iters, body, angles0)
    wav = istft(mag * angles)
    return wav / jnp.maximum(jnp.max(jnp.abs(wav)), 1e-8)
