"""Batched text embedding: tokenizer → jit-compiled BGE encoder → vectors.

The TPU-native replacement for the reference's embedding selection + encode
path (reference: retrieval_agent.py:133-168 — HuggingFaceBgeEmbeddings /
instructor / ipex-bf16 variants; embeddings.py:130-213 with the BGE query
instruction prefix; OptimizedSentenceTransformer encode loop).

Throughput design (north star: ≥1M docs/min index build):
- **Bucketed padding** (the Gaudi bucketing trick, reference
  generation/utils.py:88-110): sequence lengths round up to a fixed bucket
  ladder so XLA compiles a handful of programs, then batches stream through
  the biggest-filling bucket. No per-length recompiles, minimal pad waste.
- Fixed batch size per bucket; tails pad with dummy rows (masked out).
- Quantized (INT4) encoder params drop in transparently — same apply fn.
"""

from __future__ import annotations

import hashlib
import logging
from typing import Iterable, List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.bert import (
    BertConfig,
    bert_encode,
)

logger = logging.getLogger(__name__)

DEFAULT_BUCKETS = (32, 64, 128, 256, 512)


class SimpleTokenizer:
    """Hash-based whitespace tokenizer for tests/offline use — stands in for
    a HF tokenizer when no vocab is available (tiny-model strategy)."""

    def __init__(self, vocab_size: int = 30522, cls_id: int = 101, sep_id: int = 102):
        self.vocab_size = vocab_size
        self.cls_id = cls_id
        self.sep_id = sep_id

    def encode_one(self, text: str, max_length: int) -> List[int]:
        ids = [self.cls_id]
        for tok in text.lower().split():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            ids.append(200 + h % (self.vocab_size - 300))
            if len(ids) >= max_length - 1:
                break
        ids.append(self.sep_id)
        return ids

    def __call__(self, texts, padding=True, truncation=True, max_length=512, **kw):
        if isinstance(texts, str):
            texts = [texts]
        seqs = [self.encode_one(t, max_length) for t in texts]
        L = max(len(s) for s in seqs)
        input_ids = np.zeros((len(seqs), L), np.int32)
        mask = np.zeros((len(seqs), L), np.int32)
        for i, s in enumerate(seqs):
            input_ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return {"input_ids": input_ids, "attention_mask": mask}


def _bucket_for(length: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


class TextEmbedder:
    """encode(texts) → (N, H) normalized embeddings.

    Mirrors HuggingFaceBgeEmbeddings: `embed_documents` plain, `embed_query`
    with the BGE instruction prefix (reference: embeddings.py:200-213).
    """

    def __init__(
        self,
        params,
        config: BertConfig,
        tokenizer=None,
        *,
        batch_size: int = 128,
        max_length: int = 512,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        pooling: str = "cls",
        normalize: bool = True,
        query_instruction: str = "",
        dtype=jnp.float32,
    ):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer or SimpleTokenizer(config.vocab_size)
        self.batch_size = batch_size
        self.max_length = max_length
        self.buckets = tuple(b for b in buckets if b <= max_length) or (max_length,)
        self.pooling = pooling
        self.normalize = normalize
        self.query_instruction = query_instruction
        self.dtype = dtype

    @classmethod
    def from_pretrained(
        cls, model_name_or_path: str, quantization_config=None, **kw
    ) -> "TextEmbedder":
        """Load a HF BERT-family checkpoint (torch, host-side) and optionally
        quantize it (reference: OptimizedModel.from_pretrained path,
        optimized_sentence_transformers.py:41)."""
        import transformers

        from intel_extension_for_transformers_tpu.models.hf_convert import (
            bert_params_from_hf,
        )

        hf = transformers.AutoModel.from_pretrained(model_name_or_path)
        params, config = bert_params_from_hf(hf)
        tok = transformers.AutoTokenizer.from_pretrained(model_name_or_path)
        if quantization_config is not None:
            from intel_extension_for_transformers_tpu.quantization import (
                quantize_model,
            )

            params = quantize_model(params, quantization_config).params
        return cls(params, config, tok, **kw)

    def _encode_batch(self, input_ids, attention_mask) -> np.ndarray:
        emb = bert_encode(
            self.params,
            self.config,
            jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
            pooling=self.pooling,
            normalize=self.normalize,
        )
        return np.asarray(emb)

    def encode(self, texts: Iterable[str], is_query: bool = False) -> np.ndarray:
        texts = list(texts)
        if not texts:
            return np.zeros((0, self.config.hidden_size), np.float32)
        if is_query and self.query_instruction:
            texts = [self.query_instruction + t for t in texts]

        enc = self.tokenizer(
            texts, padding=True, truncation=True, max_length=self.max_length
        )
        input_ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        lengths = mask.sum(axis=1)

        out = np.zeros((len(texts), self.config.hidden_size), np.float32)
        # group rows by bucket to bound compiled program count
        order = np.argsort(lengths, kind="stable")
        i = 0
        while i < len(order):
            row_len = int(lengths[order[i]])
            bucket = _bucket_for(row_len, self.buckets)
            batch_rows = [order[i]]
            i += 1
            while (
                i < len(order)
                and len(batch_rows) < self.batch_size
                and _bucket_for(int(lengths[order[i]]), self.buckets) == bucket
            ):
                batch_rows.append(order[i])
                i += 1
            rows = np.asarray(batch_rows)
            B = len(rows)
            # pad rows to (batch_size, bucket) so shapes stay in the ladder
            bi = np.zeros((self.batch_size, bucket), np.int32)
            bm = np.zeros((self.batch_size, bucket), np.int32)
            L = min(input_ids.shape[1], bucket)
            bi[:B, :L] = input_ids[rows][:, :L]
            bm[:B, :L] = mask[rows][:, :L]
            emb = self._encode_batch(bi, bm)
            out[rows] = emb[:B]
        return out

    # langchain-compatible surface (reference: embeddings.py:42-213)
    def embed_documents(self, texts: List[str]) -> List[List[float]]:
        return self.encode(texts).tolist()

    def embed_query(self, text: str) -> List[float]:
        return self.encode([text], is_query=True)[0].tolist()
