"""Minimal self-contained tokenizers.

ByteTokenizer: reversible byte-level tokenizer (vocab 256 + specials) for
tests, demos, and offline smoke paths where no HF tokenizer files exist —
the tokenizer-side analogue of the reference's tiny-model test strategy.
Production paths use HF `AutoTokenizer` (tokenizers package, host-side).
"""

from __future__ import annotations

from typing import List


class ByteTokenizer:
    """ids 0..255 = bytes; 256 = BOS, 257 = EOS, 258 = PAD."""

    vocab_size = 259
    bos_token_id = 256
    eos_token_id = 257
    pad_token_id = 258

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids = list(text.encode("utf-8", errors="replace"))
        return ([self.bos_token_id] if add_bos else []) + ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        bs = bytes(i for i in ids if 0 <= int(i) < 256)
        return bs.decode("utf-8", errors="ignore")

    def __call__(self, texts, padding=True, truncation=True, max_length=512, **kw):
        import numpy as np

        if isinstance(texts, str):
            texts = [texts]
        seqs = [self.encode(t)[:max_length] for t in texts]
        L = max(len(s) for s in seqs)
        input_ids = np.full((len(seqs), L), self.pad_token_id, np.int32)
        mask = np.zeros((len(seqs), L), np.int32)
        for i, s in enumerate(seqs):
            input_ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return {"input_ids": input_ids, "attention_mask": mask}


class HybridBPETokenizer:
    """HF fast tokenizer wrapper with a native C++ BPE fast path.

    ASCII inputs to a ByteLevel-BPE tokenizer encode/decode through
    `native/bpe_tokenizer.cpp` (no GIL, no per-token Python objects — the
    serving-path hot case); everything else — non-ASCII text, sentencepiece
    models, template post-processors that inject special tokens — falls back
    to the wrapped HF tokenizer. Duck-types the `encode`/`decode`/`__call__`
    surface the chat stack uses.
    """

    def __init__(self, hf_tokenizer):
        self.hf = hf_tokenizer
        self._native = None
        try:
            import json as _json

            backend = getattr(hf_tokenizer, "backend_tokenizer", None) or \
                getattr(hf_tokenizer, "_tokenizer", None)
            spec = _json.loads(
                backend.to_str() if backend is not None
                else hf_tokenizer.to_str()
            )
            pre = (spec.get("pre_tokenizer") or {})
            pre_types = [pre.get("type")] + [
                p.get("type") for p in pre.get("pretokenizers", [])
            ]
            post = (spec.get("post_processor") or {}).get("type")
            if (
                spec.get("model", {}).get("type") == "BPE"
                and "ByteLevel" in pre_types
                and post in (None, "ByteLevel")
                and not pre.get("add_prefix_space", False)
            ):
                from intel_extension_for_transformers_tpu.native import (
                    BPETokenizerNative,
                    bpe_available,
                )

                if bpe_available():
                    self._native = BPETokenizerNative.from_tokenizer_json(spec)
                    self._special_ids = {
                        t["id"] for t in spec.get("added_tokens", [])
                        if t.get("special")
                    }
        except Exception:  # noqa: BLE001 — any mismatch → HF path
            self._native = None

    @property
    def native_active(self) -> bool:
        return self._native is not None

    def __getattr__(self, name):  # ids, vocab, specials, etc. → HF
        return getattr(self.hf, name)

    def encode(self, text: str, **kw):
        if self._native is not None and text.isascii() and not kw:
            return self._native.encode(text)
        return self.hf.encode(text, **kw)

    def decode(self, ids, skip_special_tokens: bool = True, **kw):
        if self._native is not None and not kw:
            if skip_special_tokens:
                ids = [i for i in ids if int(i) not in self._special_ids]
            return self._native.decode(ids)
        return self.hf.decode(ids, skip_special_tokens=skip_special_tokens, **kw)

    def __call__(self, *a, **kw):
        return self.hf(*a, **kw)
