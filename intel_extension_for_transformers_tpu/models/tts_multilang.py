"""Multilingual TTS frontend: language-split text → language-conditioned
FastSpeech-lite synthesis.

Re-creation of the reference's multilingual TTS plugin role (reference:
neural_chat/pipeline/plugins/audio/tts_multilang.py — BertVITS2: langid
sentence splitting, per-language phone/tone cleaning, a language-id track
fed to the synthesizer next to the phone sequence). TPU-native shape:

- `split_by_language`: Unicode-script segmentation of mixed zh/ja/en text
  (Han → zh, kana → ja, Latin → en; Han runs touching kana inside the same
  whitespace-free span are kanji → ja). Pure host preprocessing — exactly
  the part of the reference pipeline that is text, not tensors.
- `encode_multilang`: segments → (byte token ids, per-byte language ids).
  The reference conditions VITS on a language embedding interleaved with
  phones; here the shared byte vocab plus a learned per-language embedding
  plays that role, and the WHOLE mixed sentence synthesizes as one
  sequence (the reference synthesizes per segment and concatenates wavs —
  one fused sequence keeps prosody continuous and keeps the jitted shape
  static).
- `tts_multilang_apply`: encoder input = byte embed + language embed +
  sinusoidal positions, then the models/tts.py FastSpeech-lite stack
  (duration predictor, static length regulation, decoder) unchanged.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.tts import (
    TTSConfig,
    _block,
    _dense,
    _ln,
    _sinpos,
    tts_init_params,
)

# language-id codebook: 0 is reserved for padding so a masked-off tail can
# never pick up a real language embedding
LANG_IDS = {"en": 1, "zh": 2, "ja": 3}
SUPPORTED_LANGUAGES = tuple(LANG_IDS)


@dataclass(frozen=True)
class MultilangTTSConfig(TTSConfig):
    n_langs: int = 1 + len(LANG_IDS)

    @classmethod
    def test(cls) -> "MultilangTTSConfig":
        return cls(
            d_model=32, encoder_layers=1, decoder_layers=1, num_heads=2,
            ffn_dim=64, n_mels=20, max_text_len=48, max_frames=64,
        )


def _char_lang(ch: str) -> str | None:
    """Script class of one char: 'zh' | 'ja' | 'en' | None (neutral —
    digits, punctuation, space attach to the surrounding segment)."""
    cp = ord(ch)
    if 0x3040 <= cp <= 0x30FF or 0x31F0 <= cp <= 0x31FF:  # kana
        return "ja"
    if (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0xF900 <= cp <= 0xFAFF
    ):  # Han
        return "zh"
    if ch.isalpha() and unicodedata.category(ch).startswith("L"):
        return "en"
    return None


def split_by_language(text, target_languages=SUPPORTED_LANGUAGES):
    """Mixed text → [(segment, lang), ...] preserving every character.

    Reference analogue: bert_vits2 tools.sentence.split_by_language
    (tts_multilang.py:137 — langid over sentence pieces). Here scripts are
    unambiguous for kana/Latin; Han is zh unless the same whitespace-free
    span also contains kana (Japanese kanji+okurigana). Neutral chars
    (digits, punctuation, spaces) glue to the open segment; a leading
    neutral run takes the first real segment's language."""
    if not text:
        return []
    # pass 1: per-char labels with the kanji disambiguation
    labels: list = [None] * len(text)
    span_start = 0
    spans = []
    for i, ch in enumerate(text):
        if ch.isspace():
            if span_start < i:
                spans.append((span_start, i))
            span_start = i + 1
    if span_start < len(text):
        spans.append((span_start, len(text)))
    for a, b in spans:
        langs = [_char_lang(c) for c in text[a:b]]
        if "ja" in langs:
            langs = ["ja" if l == "zh" else l for l in langs]
        for j, l in enumerate(langs):
            labels[a + j] = l
    # pass 2: merge into segments, folding neutral runs into neighbours
    segs: list = []
    cur, cur_lang = [], None
    default = target_languages[0] if target_languages else "en"
    for ch, l in zip(text, labels):
        if l is None or l == cur_lang:
            cur.append(ch)
            continue
        if cur_lang is None:  # leading neutrals adopt the first real lang
            cur.append(ch)
            cur_lang = l
            continue
        segs.append(("".join(cur), cur_lang))
        cur, cur_lang = [ch], l
    if cur:
        segs.append(("".join(cur), cur_lang or default))
    # collapse unsupported langs onto the default
    return [
        (s, l if l in target_languages else default) for s, l in segs
    ]


def encode_multilang(text: str, max_len: int | None = None):
    """text → (byte ids (L,), lang ids (L,)) — UTF-8 bytes with each byte
    carrying its segment's language id (multi-byte CJK chars replicate it)."""
    toks, langs = [], []
    for seg, lang in split_by_language(text):
        b = seg.encode("utf-8", errors="replace")
        toks.extend(b)
        langs.extend([LANG_IDS[lang]] * len(b))
    if not toks:
        toks, langs = [0], [0]
    ids = np.asarray(toks, np.int32)
    lid = np.asarray(langs, np.int32)
    if max_len is not None:
        ids, lid = ids[:max_len], lid[:max_len]
    return ids, lid


@partial(jax.jit, static_argnames=("cfg",))
def tts_multilang_apply(params, cfg: MultilangTTSConfig, text_ids, lang_ids,
                        text_mask=None):
    """(B, Lt) byte ids + (B, Lt) language ids → (mel, frame_count, dur).

    Identical to tts.tts_apply except the encoder input carries a learned
    language embedding (the BertVITS2 language track, tts_multilang.py:242:
    `language = torch.LongTensor(language)` fed beside phones/tones)."""
    B, Lt = text_ids.shape
    if text_mask is None:
        text_mask = jnp.ones((B, Lt), bool)
    x = (
        jnp.take(params["embed"], text_ids, axis=0)
        + jnp.take(params["lang_embed"], lang_ids, axis=0)
        + _sinpos(Lt, cfg.d_model)[None]
    )
    for p in params["encoder"]:
        x = _block(x, p, cfg.num_heads, mask=text_mask)
    d = _dense(jax.nn.relu(_dense(x, params["dur1"])), params["dur2"])[..., 0]
    dur = jnp.clip(jnp.exp(d) - 1.0, 1.0, 32.0) * text_mask
    cum = jnp.cumsum(dur, axis=1)
    total = jnp.minimum(cum[:, -1], cfg.max_frames).astype(jnp.int32)
    frames = jnp.arange(cfg.max_frames, dtype=jnp.float32)[None, :]
    src = jnp.sum(cum[:, None, :] <= frames[:, :, None], axis=-1)
    src = jnp.minimum(src, Lt - 1)
    y = jnp.take_along_axis(x, src[..., None], axis=1)
    y = y + _sinpos(cfg.max_frames, cfg.d_model)[None]
    fmask = frames[0][None, :] < total[:, None]
    for p in params["decoder"]:
        y = _block(y, p, cfg.num_heads, mask=fmask)
    mel = _dense(_ln(y, params["ln_out"]), params["mel_out"])
    return mel, total, dur


def tts_multilang_init_params(key, cfg: MultilangTTSConfig) -> dict:
    k1, k2 = jax.random.split(key)
    params = tts_init_params(k1, cfg)
    params["lang_embed"] = (
        jax.random.normal(k2, (cfg.n_langs, cfg.d_model), jnp.float32) * 0.02
    )
    return params


def synthesize_multilang(params, cfg: MultilangTTSConfig, text: str,
                         vocoder_iters: int = 32):
    """Mixed-language text → (waveform float32, languages used)."""
    from intel_extension_for_transformers_tpu.models.tts import griffin_lim

    ids, lid = encode_multilang(text, max_len=cfg.max_text_len)
    mel, total, _ = tts_multilang_apply(params, cfg, ids[None], lid[None])
    n = max(int(total[0]), 1)
    wav = griffin_lim(mel[0, :n], iters=vocoder_iters, n_mels=cfg.n_mels)
    used = sorted(
        {l for l, i in LANG_IDS.items() if np.any(np.asarray(lid) == i)}
    )
    return np.asarray(wav), used
