"""Built-in chat pipeline plugins: safety, cache, memory, NER, intent.

Parity with the reference plugin set (reference: pipeline/plugins/):
- SafetyChecker — dict-based sensitive-word matching
  (security/safety_checker.py: sensitive_check / sensitive_filter).
- ChatCache — semantic response cache: embedding similarity over previous
  queries (caching/cache.py, gptcache-based in the reference; here it reuses
  our own FlatIndex instead of faiss).
- Memory — conversation buffer (memory/memory.py).
- NamedEntityRecognizer — regex/heuristic NER stub standing in for the spacy
  pipeline (ner/ner.py), gated the same way the reference gates heavy deps.
- IntentDetector — LLM-probe intent detection (detector/intent_detection.py).
Audio (ASR/TTS) and image/video plugins are declared but disabled unless
their deps exist — matching the reference's optional-dependency gating
(chatbot.py:33-100).
"""

from __future__ import annotations

import re
from typing import List, Optional

import numpy as np

from intel_extension_for_transformers_tpu.neural_chat.plugins import register_plugin

# A small default denylist; production deployments load their own dictionary
# file like the reference's sensitive-word dict.
DEFAULT_SENSITIVE_WORDS = [
    "damn",
    "hell no",
    "idiot",
    "stupid fool",
]


@register_plugin("safety_checker")
class SafetyChecker:
    def __init__(
        self,
        dict_path: Optional[str] = None,
        matchType: int = 2,
        extra_words: Optional[List[str]] = None,
    ):
        words = list(DEFAULT_SENSITIVE_WORDS)
        if dict_path:
            with open(dict_path, encoding="utf-8") as f:
                words += [w.strip() for w in f if w.strip()]
        if extra_words:
            words += extra_words
        self.words = sorted(set(w.lower() for w in words), key=len, reverse=True)

    def sensitive_check(self, text: str) -> bool:
        low = text.lower()
        return any(w in low for w in self.words)

    def sensitive_filter(self, text: str) -> str:
        out = text
        for w in self.words:
            out = re.sub(re.escape(w), "*" * len(w), out, flags=re.I)
        return out

    # hook protocol
    def pre_llm_inference_actions(self, query: str):
        if self.sensitive_check(query):
            return {
                "stop_inference": True,
                "response": "Your query contains sensitive words, please try another query.",
            }
        return query

    def post_llm_inference_actions(self, response: str) -> str:
        return self.sensitive_filter(response)


@register_plugin("cache")
class ChatCache:
    """Semantic cache: answer repeats of semantically-equal queries
    (reference: caching/cache.py ChatCache with gptcache; here: our own
    embedding index, cosine threshold)."""

    def __init__(self, embedder=None, similarity_threshold: float = 0.9, capacity: int = 4096):
        self.embedder = embedder
        self.threshold = similarity_threshold
        self.queries: List[str] = []
        self.responses: List[str] = []
        self._index = None
        self._capacity = capacity

    def _encode(self, text: str) -> np.ndarray:
        if self.embedder is not None:
            return np.asarray(self.embedder.encode([text], is_query=False))[0]
        # hashing fallback embedder (offline/test)
        rngv = np.zeros(64, np.float32)
        for tok in re.findall(r"\w+", text.lower()):
            rngv[hash(tok) % 64] += 1.0
        n = np.linalg.norm(rngv)
        return rngv / n if n else rngv

    def get(self, query: str) -> Optional[str]:
        if not self.queries:
            return None
        from intel_extension_for_transformers_tpu.retrieval.index import FlatIndex

        if self._index is None:
            return None
        v = self._encode(query)
        scores, ids = self._index.search(v, k=1)
        if float(scores[0]) >= self.threshold:
            return self.responses[int(ids[0])]
        return None

    def put(self, query: str, response: str) -> None:
        from intel_extension_for_transformers_tpu.retrieval.index import FlatIndex

        v = self._encode(query)
        if self._index is None:
            self._index = FlatIndex(dim=v.shape[0], dtype="float32", metric="cosine")
        self._index.add(v[None, :])
        self.queries.append(query)
        self.responses.append(response)

    def pre_llm_inference_actions(self, query: str):
        hit = self.get(query)
        if hit is not None:
            return {"stop_inference": True, "response": hit}
        return query


@register_plugin("memory")
class Memory:
    """Conversation buffer (reference: memory/memory.py)."""

    def __init__(self, max_turns: int = 10):
        self.max_turns = max_turns
        self.turns: List[tuple] = []

    def add(self, query: str, response: str) -> None:
        self.turns.append((query, response))
        self.turns = self.turns[-self.max_turns :]

    def context(self) -> str:
        return "\n".join(f"User: {q}\nAssistant: {r}" for q, r in self.turns)

    def clear(self) -> None:
        self.turns = []


@register_plugin("ner")
class NamedEntityRecognizer:
    """NER plugin: BERT token-classification tagger (models/ner.py) when a
    model is configured, heuristic patterns otherwise.

    Mirrors the reference's spacy plugin surface (ner/ner.py:34-55
    `ner_inference(response) → {period, time, location, name, organization}`)
    with our own encoder instead of a spacy dependency. Configure with
    `model="dslim/bert-base-NER"` (HF BertForTokenClassification) or
    `preloaded=(params, NerConfig, tokenizer)`.
    """

    PATTERNS = {
        "EMAIL": re.compile(r"[\w.+-]+@[\w-]+\.[\w.]+"),
        "URL": re.compile(r"https?://\S+"),
        "DATE": re.compile(
            r"\b\d{1,2}[:/.-]\d{1,2}(?:[:/.-]\d{2,4})?\b"
            r"|\b\d{1,2}(?:st|nd|rd|th)?\s+"
            r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\w*"
            r"(?:\s+\d{4})?\b"
            r"|\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\w*"
            r"\s+\d{1,2}(?:st|nd|rd|th)?(?:,?\s+\d{4})?\b",
            re.IGNORECASE,
        ),
        "NUMBER": re.compile(r"\b\d+(?:\.\d+)?\b"),
        "PER": re.compile(r"\b(?:[A-Z][a-z]+ ){1,2}[A-Z][a-z]+\b"),
    }

    def __init__(self, model: Optional[str] = None, preloaded=None, **kw):
        self._model = None
        if preloaded is not None:
            from intel_extension_for_transformers_tpu.models.ner import NerModel

            self._model = NerModel(*preloaded, **kw)
        elif model is not None:
            from intel_extension_for_transformers_tpu.models.ner import NerModel

            self._model = NerModel.from_pretrained(model, **kw)

    def extract(self, text: str) -> List[dict]:
        """→ [{text, label, start}] (model spans when available, else
        heuristics; heuristics also backfill EMAIL/URL which CoNLL label
        sets don't cover)."""
        out = []
        covered = []
        if self._model is not None:
            for e in self._model.tag(text):
                out.append({"text": e.text, "label": e.label,
                            "start": e.start, "score": e.score})
                covered.append((e.start, e.end))
        pattern_menu = (
            ("EMAIL", "URL", "DATE") if self._model is not None
            else tuple(self.PATTERNS)
        )
        for label in pattern_menu:
            for m in self.PATTERNS[label].finditer(text):
                if any(m.start() < c1 and m.end() > c0 for c0, c1 in covered):
                    continue  # model span wins
                out.append({"text": m.group(), "label": label, "start": m.start()})
        return sorted(out, key=lambda e: e["start"])

    def ner_inference(self, response: str) -> dict:
        """Reference-shaped result (ner/ner.py:44-55): entity buckets plus
        resolved time periods."""
        from intel_extension_for_transformers_tpu.models.ner import (
            Entity,
            ner_result,
        )

        ents = [
            Entity(
                text=d["text"], label=d["label"], start=d["start"],
                end=d["start"] + len(d["text"]), score=d.get("score", 1.0),
            )
            for d in self.extract(response)
        ]
        return ner_result(response, ents)


class IntentDetector:
    """LLM intent probe (reference: detector/intent_detection.py:24-38 —
    10-token generation over the intent prompt)."""

    def __init__(self, predict_fn):
        self.predict_fn = predict_fn

    def intent_detection(self, query: str) -> str:
        from intel_extension_for_transformers_tpu.neural_chat.prompts import (
            generate_intent_prompt,
        )

        out = self.predict_fn(generate_intent_prompt(query), max_new_tokens=10)
        return "chitchat" if "chitchat" in out.lower() else "QA"


@register_plugin("image2image")
class Image2ImagePlugin:
    """Stable-Diffusion img2img (reference:
    pipeline/plugins/image2image/ — diffusers StableDiffusionImg2ImgPipeline;
    headline SD v1.5 bf16 2.74 s / 20 steps, docs/release_data.md:88).

    Backed by the JAX diffusion stack (diffusion/pipeline.py): pass a built
    `pipeline`, or a `config` ("sd15" | "tiny" | StableDiffusionConfig) to
    random-init one (demo/testing; load converted weights for production)."""

    def __init__(self, pipeline=None, config="tiny", seed: int = 0, **gen_kw):
        import jax

        from intel_extension_for_transformers_tpu.diffusion import (
            StableDiffusionConfig,
            StableDiffusionPipeline,
        )

        if pipeline is None:
            if isinstance(config, str):
                config = (
                    StableDiffusionConfig.sd15()
                    if config == "sd15"
                    else StableDiffusionConfig.tiny()
                )
            pipeline = StableDiffusionPipeline.random_init(
                jax.random.PRNGKey(seed), config
            )
        self.pipeline = pipeline
        self.gen_kw = gen_kw

    def image2image(self, prompt: str, image, **kw):
        """(B|1, H, W, 3) array in [-1, 1] → transformed images."""
        import numpy as np

        image = np.asarray(image, np.float32)
        if image.ndim == 3:
            image = image[None]
        return self.pipeline.img2img(prompt, image, **{**self.gen_kw, **kw})

    def text2image(self, prompt: str, **kw):
        return self.pipeline.text2img(prompt, **{**self.gen_kw, **kw})


@register_plugin("asr")
class AsrPlugin:
    """Whisper-class speech-to-text (reference:
    pipeline/plugins/audio/asr.py — transformers Whisper; here the JAX
    encoder-decoder in models/whisper.py, parity-tested vs HF to 3e-6).

    Construct with `preloaded=(params, config, tokenizer)` or a HF
    `model_name_or_path` (host-side torch conversion)."""

    def __init__(
        self,
        preloaded=None,
        model_name_or_path: str = "openai/whisper-tiny",
        prompt_ids=(50258,),  # <|startoftranscript|> for real checkpoints
        eos_token_id=None,
        max_new_tokens: int = 128,
    ):
        from intel_extension_for_transformers_tpu.models import whisper as W

        if preloaded is not None:
            self.params, self.config, self.tokenizer = preloaded
        else:
            import transformers

            hf_model = transformers.WhisperForConditionalGeneration.from_pretrained(
                model_name_or_path
            )
            self.params, self.config = W.whisper_params_from_hf(hf_model)
            self.tokenizer = transformers.WhisperTokenizer.from_pretrained(
                model_name_or_path
            )
        self._W = W
        self.prompt_ids = list(prompt_ids)
        self.eos_token_id = eos_token_id
        self.max_new_tokens = max_new_tokens

    def audio2text(self, audio, sampling_rate: int = 16000) -> str:
        """mono waveform in [-1, 1] → transcription.

        Long-form audio transcribes in sequential encoder-window chunks
        (Whisper's 30 s budget; reference asr.py chunks via the HF pipeline
        the same sequential way) — each chunk reuses the SAME compiled
        encode/decode programs, so chunk count never retraces."""
        import numpy as np

        audio = np.asarray(audio, np.float32)
        max_frames = self.config.max_source_positions * 2  # conv stride 2
        hop = 160  # mel hop length at 16 kHz
        window_samples = max_frames * hop
        pieces = []
        for s0 in range(0, max(len(audio), 1), window_samples):
            chunk = audio[s0 : s0 + window_samples]
            mel = self._W.log_mel_spectrogram(
                chunk, n_mels=self.config.num_mel_bins
            )
            mel = mel[:, :max_frames]
            if mel.shape[1] < max_frames:
                mel = np.pad(mel, ((0, 0), (0, max_frames - mel.shape[1])))
            ids = self._W.whisper_generate(
                self.params,
                self.config,
                mel[None],
                np.asarray([self.prompt_ids], np.int32),
                max_new_tokens=self.max_new_tokens,
                eos_token_id=self.eos_token_id,
            )[0]
            if self.eos_token_id is not None:
                ids = ids[ids != self.eos_token_id]
            text = self.tokenizer.decode(list(ids), skip_special_tokens=True)
            if text:
                pieces.append(text.strip())
        return " ".join(pieces)

    # plugin pre-hook protocol: audio query → text query
    def pre_llm_inference_actions(self, query):
        if isinstance(query, str):
            return query
        return self.audio2text(query)


@register_plugin("tts")
class TtsPlugin:
    """Text-to-speech (reference: pipeline/plugins/audio/tts.py — SpeechT5
    pipeline). Here: the FastSpeech-style mel generator + Griffin-Lim
    vocoder in models/tts.py — the vocoder is pure DSP and fully functional;
    the mel generator runs random-init until a trained checkpoint is loaded
    via `preloaded=(params, config)`."""

    def __init__(self, preloaded=None, sample_rate: int = 16000,
                 vocoder_iters: int = 32):
        import jax

        from intel_extension_for_transformers_tpu.models import tts as T

        if preloaded is not None:
            self.params, self.config = preloaded
        else:
            self.config = T.TTSConfig()
            self.params = T.tts_init_params(jax.random.PRNGKey(0), self.config)
        self._T = T
        self.sample_rate = sample_rate
        self.vocoder_iters = vocoder_iters

    def text2speech(self, text: str):
        """→ (waveform float32 [-1, 1], sample_rate)."""
        import numpy as np

        ids = np.frombuffer(
            text.encode("utf-8", errors="replace"), np.uint8
        ).astype(np.int32)[: self.config.max_text_len]
        if len(ids) == 0:
            ids = np.zeros((1,), np.int32)
        mel, total, _ = self._T.tts_apply(self.params, self.config, ids[None])
        n = int(total[0])
        wav = self._T.griffin_lim(
            mel[0, : max(n, 1)],
            iters=self.vocoder_iters,
            n_mels=self.config.n_mels,
        )
        return np.asarray(wav), self.sample_rate

    # plugin post-hook protocol: attach audio alongside the text response
    def post_llm_inference_actions(self, response: str):
        return response


@register_plugin("tts_multilang")
class MultilangTtsPlugin:
    """Multilingual TTS (reference: pipeline/plugins/audio/tts_multilang.py
    — BertVITS2 with langid splitting and a language-id track). Here: the
    language-conditioned FastSpeech-lite in models/tts_multilang.py —
    Unicode-script segmentation of mixed zh/ja/en text, a learned
    per-language embedding beside the byte embeddings, one fused synthesis
    over the whole mixed sentence."""

    def __init__(self, preloaded=None, sample_rate: int = 16000,
                 vocoder_iters: int = 32):
        import jax

        from intel_extension_for_transformers_tpu.models import (
            tts_multilang as M,
        )

        if preloaded is not None:
            self.params, self.config = preloaded
        else:
            self.config = M.MultilangTTSConfig()
            self.params = M.tts_multilang_init_params(
                jax.random.PRNGKey(0), self.config
            )
        self._M = M
        self.sample_rate = sample_rate
        self.vocoder_iters = vocoder_iters
        self.languages = list(M.SUPPORTED_LANGUAGES)

    def text2speech(self, text: str):
        """→ (waveform float32 [-1, 1], sample_rate)."""
        wav, _ = self._M.synthesize_multilang(
            self.params, self.config, text or "\0",
            vocoder_iters=self.vocoder_iters,
        )
        return wav, self.sample_rate

    def post_llm_inference_actions(self, response: str):
        return response
