"""Whisper-class speech encoder-decoder in pure JAX (the ASR model).

Re-creation of the model behind the reference's ASR plugin
(reference: neural_chat/pipeline/plugins/audio/asr.py — transformers
WhisperForConditionalGeneration). TPU-first: static-shape mel frontend via
jnp FFT, one jitted encoder pass, decoder greedy loop with a static KV cache.

Architecture (HF Whisper): log-mel (80, 3000) → conv1(k3,s1)+gelu →
conv2(k3,s2)+gelu → +sinusoidal positions → pre-LN transformer encoder;
decoder: token+learned-pos embeddings, pre-LN blocks of causal self-attn,
cross-attn over encoder states, gelu MLP; tied lm head. Whisper's k_proj has
NO bias; q/v/out do.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 384  # whisper-tiny
    encoder_layers: int = 4
    decoder_layers: int = 4
    num_heads: int = 6
    ffn_dim: int = 1536
    max_source_positions: int = 1500
    max_target_positions: int = 448

    @classmethod
    def tiny_hf(cls) -> "WhisperConfig":
        return cls()

    @classmethod
    def test(cls) -> "WhisperConfig":
        return cls(
            vocab_size=256, num_mel_bins=16, d_model=32, encoder_layers=2,
            decoder_layers=2, num_heads=4, ffn_dim=64,
            max_source_positions=50, max_target_positions=32,
        )


# ----------------------------- mel frontend -----------------------------


def log_mel_spectrogram(
    audio: jnp.ndarray,  # (T,) 16 kHz mono in [-1, 1]
    n_mels: int = 80,
    n_fft: int = 400,
    hop: int = 160,
    sr: int = 16000,
) -> jnp.ndarray:
    """→ (n_mels, frames) log-mel features (Whisper convention: hann window,
    magnitude², slaney-ish mel filterbank, log10 clamped to max-8)."""
    audio = jnp.asarray(audio, jnp.float32)
    pad = n_fft // 2
    x = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (x.shape[0] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[idx] * jnp.hanning(n_fft + 1)[:-1]
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2  # (frames, nfft//2+1)
    spec = spec[:-1]  # whisper drops the last frame
    mel_fb = jnp.asarray(_mel_filterbank(sr, n_fft, n_mels))
    mel = spec @ mel_fb.T  # (frames, n_mels)
    logmel = jnp.log10(jnp.maximum(mel, 1e-10))
    logmel = jnp.maximum(logmel, logmel.max() - 8.0)
    return ((logmel + 4.0) / 4.0).T  # (n_mels, frames)


def _mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank (librosa/Whisper style)."""

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(
            log_region, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / (np.log(6.4) / 27.0), mel
        )
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    fmax = sr / 2
    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    fft_freqs = np.linspace(0, fmax, n_fft // 2 + 1)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, c, hi = freqs[i], freqs[i + 1], freqs[i + 2]
        up = (fft_freqs - lo) / max(c - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - c, 1e-9)
        fb[i] = np.maximum(0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)  # slaney area normalization
    return fb.astype(np.float32)


# ----------------------------- model blocks -----------------------------


def _ln(x, p, eps=1e-5):
    m = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), -1, keepdims=True)
    y = ((x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + eps)).astype(x.dtype)
    return y * p["scale"] + p["bias"]


def _dense(x, p):
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _mha(q_in, kv_in, p, nh, mask=None):
    B, Lq, D = q_in.shape
    hd = D // nh
    q = _dense(q_in, p["q"]).reshape(B, Lq, nh, hd) * (hd**-0.5)
    k = _dense(kv_in, p["k"]).reshape(B, -1, nh, hd)
    v = _dense(kv_in, p["v"]).reshape(B, -1, nh, hd)
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    if mask is not None:
        att = jnp.where(mask, att, -jnp.inf)
    att = jax.nn.softmax(att.astype(jnp.float32), -1).astype(q_in.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, Lq, D)
    return _dense(ctx, p["o"])


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoidal encoder positions."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    ang = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)


@partial(jax.jit, static_argnames=("cfg",))
def whisper_encode(params, cfg: WhisperConfig, mel):
    """mel (B, n_mels, frames) → encoder states (B, frames//2, D)."""
    p = params["encoder"]
    x = mel.transpose(0, 2, 1)  # (B, T, mels) — NWC conv
    x = jax.nn.gelu(
        jax.lax.conv_general_dilated(
            x, p["conv1"]["kernel"], (1,), ((1, 1),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        + p["conv1"]["bias"]
    )
    x = jax.nn.gelu(
        jax.lax.conv_general_dilated(
            x, p["conv2"]["kernel"], (2,), ((1, 1),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        + p["conv2"]["bias"]
    )
    x = x + p["pos"][None, : x.shape[1]]
    for layer in p["layers"]:
        h = _ln(x, layer["ln1"])
        x = x + _mha(h, h, layer["attn"], cfg.num_heads)
        h = _ln(x, layer["ln2"])
        x = x + _dense(jax.nn.gelu(_dense(h, layer["fc1"])), layer["fc2"])
    return _ln(x, p["ln_post"])


@partial(jax.jit, static_argnames=("cfg",))
def whisper_decode_logits(params, cfg: WhisperConfig, tokens, enc):
    """Full-sequence decoder forward (teacher forcing) → (B, L, V)."""
    p = params["decoder"]
    B, L = tokens.shape
    x = jnp.take(p["tok_embed"], tokens, axis=0) + p["pos_embed"][None, :L]
    causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
    for layer in p["layers"]:
        h = _ln(x, layer["ln1"])
        x = x + _mha(h, h, layer["self_attn"], cfg.num_heads, mask=causal)
        h = _ln(x, layer["ln2"])
        x = x + _mha(h, enc, layer["cross_attn"], cfg.num_heads)
        h = _ln(x, layer["ln3"])
        x = x + _dense(jax.nn.gelu(_dense(h, layer["fc1"])), layer["fc2"])
    x = _ln(x, p["ln_final"])
    return x @ p["tok_embed"].T.astype(x.dtype)


def whisper_generate(
    params, cfg: WhisperConfig, mel, prompt_ids, max_new_tokens: int = 64,
    eos_token_id: Optional[int] = None,
):
    """Greedy transcription: mel (B, mels, frames), prompt (B, P) forced ids.

    Static-shape loop: the decoder re-runs over a fixed (B, P+max) buffer
    with a position mask (tiny decoder; the KV-cache variant is unnecessary
    at whisper sizes where the ENCODER dominates)."""
    enc = whisper_encode(params, cfg, jnp.asarray(mel))
    B, P = prompt_ids.shape
    L = min(P + max_new_tokens, cfg.max_target_positions)
    buf = jnp.zeros((B, L), jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, jnp.asarray(prompt_ids, jnp.int32), (0, 0))

    @partial(jax.jit, static_argnames=())
    def step(buf, pos):
        logits = whisper_decode_logits(params, cfg, buf, enc)
        nxt = jnp.argmax(logits[:, pos - 1], -1).astype(jnp.int32)
        return jax.lax.dynamic_update_slice(buf, nxt[:, None], (0, pos)), nxt

    out = []
    finished = np.zeros((B,), bool)
    for pos in range(P, L):
        buf, nxt = step(buf, pos)
        t = np.asarray(nxt)
        out.append(t)
        if eos_token_id is not None:
            finished |= t == eos_token_id
            if finished.all():
                break
    return np.stack(out, 1) if out else np.zeros((B, 0), np.int32)


@partial(jax.jit, static_argnames=("cfg", "prompt_len", "max_new_tokens"))
def whisper_generate_compiled(
    params, cfg: WhisperConfig, mel, prompt_ids, prompt_len: int,
    max_new_tokens: int = 64,
):
    """Whole greedy transcription as ONE XLA program: encode + a
    `lax.fori_loop` of decode steps (zero per-token dispatch — the serving
    and benchmarking path; `whisper_generate` above is the streaming/early-
    EOS host loop). → (B, max_new_tokens) ids, matches whisper_generate
    without EOS early-exit."""
    enc = whisper_encode(params, cfg, jnp.asarray(mel))
    B = prompt_ids.shape[0]
    P = prompt_len
    L = min(P + max_new_tokens, cfg.max_target_positions)
    buf = jnp.zeros((B, L), jnp.int32)
    buf = jax.lax.dynamic_update_slice(
        buf, jnp.asarray(prompt_ids, jnp.int32), (0, 0)
    )

    def body(pos, buf):
        logits = whisper_decode_logits(params, cfg, buf, enc)
        prev = jnp.take_along_axis(
            logits, (pos - 1)[None, None, None].repeat(B, 0), axis=1
        )[:, 0]
        nxt = jnp.argmax(prev, -1).astype(jnp.int32)
        return jax.lax.dynamic_update_slice(buf, nxt[:, None], (0, pos))

    buf = jax.lax.fori_loop(jnp.int32(P), jnp.int32(L), body, buf)
    return jax.lax.dynamic_slice(buf, (0, P), (B, L - P))


# ------------------------------- init / convert -------------------------------


def _init_dense(key, cin, cout, bias=True, scale=1.0):
    p = {"kernel": jax.random.normal(key, (cin, cout), jnp.float32) * scale / np.sqrt(cin)}
    if bias:
        p["bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _init_attn(keys, d):
    return {
        "q": _init_dense(next(keys), d, d),
        "k": _init_dense(next(keys), d, d, bias=False),  # whisper: no k bias
        "v": _init_dense(next(keys), d, d),
        "o": _init_dense(next(keys), d, d, scale=0.5),
    }


def whisper_init_params(key, cfg: WhisperConfig) -> dict:
    keys = iter(jax.random.split(key, 1024))
    D = cfg.d_model
    enc = {
        "conv1": {
            "kernel": jax.random.normal(next(keys), (3, cfg.num_mel_bins, D))
            * 0.05,
            "bias": jnp.zeros((D,)),
        },
        "conv2": {
            "kernel": jax.random.normal(next(keys), (3, D, D)) * 0.05,
            "bias": jnp.zeros((D,)),
        },
        "pos": jnp.asarray(_sinusoids(cfg.max_source_positions, D)),
        "layers": [],
        "ln_post": _init_ln(D),
    }
    for _ in range(cfg.encoder_layers):
        enc["layers"].append(
            {
                "ln1": _init_ln(D),
                "attn": _init_attn(keys, D),
                "ln2": _init_ln(D),
                "fc1": _init_dense(next(keys), D, cfg.ffn_dim),
                "fc2": _init_dense(next(keys), cfg.ffn_dim, D, scale=0.5),
            }
        )
    dec = {
        "tok_embed": jax.random.normal(next(keys), (cfg.vocab_size, D)) * 0.02,
        "pos_embed": jax.random.normal(next(keys), (cfg.max_target_positions, D))
        * 0.01,
        "layers": [],
        "ln_final": _init_ln(D),
    }
    for _ in range(cfg.decoder_layers):
        dec["layers"].append(
            {
                "ln1": _init_ln(D),
                "self_attn": _init_attn(keys, D),
                "ln2": _init_ln(D),
                "cross_attn": _init_attn(keys, D),
                "ln3": _init_ln(D),
                "fc1": _init_dense(next(keys), D, cfg.ffn_dim),
                "fc2": _init_dense(next(keys), cfg.ffn_dim, D, scale=0.5),
            }
        )
    return {"encoder": enc, "decoder": dec}


def whisper_params_from_hf(hf_model) -> tuple[dict, WhisperConfig]:
    """Convert transformers WhisperForConditionalGeneration."""
    hc = hf_model.config
    cfg = WhisperConfig(
        vocab_size=hc.vocab_size,
        num_mel_bins=hc.num_mel_bins,
        d_model=hc.d_model,
        encoder_layers=hc.encoder_layers,
        decoder_layers=hc.decoder_layers,
        num_heads=hc.encoder_attention_heads,
        ffn_dim=hc.encoder_ffn_dim,
        max_source_positions=hc.max_source_positions,
        max_target_positions=hc.max_target_positions,
    )
    sd = {k: v.detach().cpu().float().numpy() for k, v in hf_model.state_dict().items()}

    def lin(prefix, bias=True):
        p = {"kernel": jnp.asarray(sd[prefix + ".weight"].T)}
        if bias and prefix + ".bias" in sd:
            p["bias"] = jnp.asarray(sd[prefix + ".bias"])
        return p

    def ln(prefix):
        return {
            "scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
        }

    def attn(prefix):
        return {
            "q": lin(prefix + ".q_proj"),
            "k": lin(prefix + ".k_proj", bias=False),
            "v": lin(prefix + ".v_proj"),
            "o": lin(prefix + ".out_proj"),
        }

    e = "model.encoder."
    enc = {
        # torch Conv1d (out, in, k) → (k, in, out)
        "conv1": {
            "kernel": jnp.asarray(sd[e + "conv1.weight"].transpose(2, 1, 0)),
            "bias": jnp.asarray(sd[e + "conv1.bias"]),
        },
        "conv2": {
            "kernel": jnp.asarray(sd[e + "conv2.weight"].transpose(2, 1, 0)),
            "bias": jnp.asarray(sd[e + "conv2.bias"]),
        },
        "pos": jnp.asarray(sd[e + "embed_positions.weight"]),
        "layers": [],
        "ln_post": ln(e + "layer_norm"),
    }
    for li in range(cfg.encoder_layers):
        p = f"{e}layers.{li}."
        enc["layers"].append(
            {
                "ln1": ln(p + "self_attn_layer_norm"),
                "attn": attn(p + "self_attn"),
                "ln2": ln(p + "final_layer_norm"),
                "fc1": lin(p + "fc1"),
                "fc2": lin(p + "fc2"),
            }
        )
    d = "model.decoder."
    dec = {
        "tok_embed": jnp.asarray(sd[d + "embed_tokens.weight"]),
        "pos_embed": jnp.asarray(sd[d + "embed_positions.weight"]),
        "layers": [],
        "ln_final": ln(d + "layer_norm"),
    }
    for li in range(cfg.decoder_layers):
        p = f"{d}layers.{li}."
        dec["layers"].append(
            {
                "ln1": ln(p + "self_attn_layer_norm"),
                "self_attn": attn(p + "self_attn"),
                "ln2": ln(p + "encoder_attn_layer_norm"),
                "cross_attn": attn(p + "encoder_attn"),
                "ln3": ln(p + "final_layer_norm"),
                "fc1": lin(p + "fc1"),
                "fc2": lin(p + "fc2"),
            }
        )
    return {"encoder": enc, "decoder": dec}, cfg
