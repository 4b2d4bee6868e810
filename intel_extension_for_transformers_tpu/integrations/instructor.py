"""Instruction-tuned embeddings (INSTRUCTOR-style context-masked pooling).

Re-creation of the reference's first-class instructor-embedding path
(reference: transformers/langchain/langchain_community/embeddings/
optimized_instructor_embedding.py:1-227 — wraps
`InstructorEmbedding.INSTRUCTOR_Transformer`, whose forward pools ONLY the
non-instruction tokens via `context_masks`; consumed by the retrieval
agent when `embedding_model` contains "instructor",
retrieval_agent.py:133-147).

TPU formulation: one jit-compiled BERT encode of "[instruction][text]"
where mean pooling is computed against a CONTEXT mask that zeroes the
instruction span (attention still sees the instruction — that is what
conditions the embedding). The instruction token length is computed once
per call from the tokenizer, so every (bucket, instr_len) pair reuses the
same compiled program.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.bert import bert_apply
from intel_extension_for_transformers_tpu.retrieval.embedder import (
    TextEmbedder,
    _bucket_for,
)

__all__ = ["InstructorEmbedder", "InstructorEmbeddings"]

DEFAULT_EMBED_INSTRUCTION = "Represent the document for retrieval: "
DEFAULT_QUERY_INSTRUCTION = (
    "Represent the question for retrieving supporting documents: "
)


class InstructorEmbedder(TextEmbedder):
    """TextEmbedder whose pooling excludes a per-call instruction prefix."""

    def _instr_len(self, instruction: str) -> int:
        """Token length of the instruction inside '[instr][text]' —
        everything before it in the joint encoding except the final SEP."""
        if not instruction:
            return 0
        enc = self.tokenizer([instruction], padding=True, truncation=True,
                             max_length=self.max_length)
        ids = np.asarray(enc["input_ids"])[0]
        n = int(np.asarray(enc["attention_mask"])[0].sum())
        # BERT-style tokenizers close with [SEP]; the joint encoding keeps
        # one trailing SEP only, so the instruction span excludes it
        sep = getattr(self.tokenizer, "sep_token_id", None)
        if sep is not None and n > 0 and int(ids[n - 1]) == sep:
            n -= 1
        return n

    def encode_with_instruction(
        self, texts: Iterable[str], instruction: str
    ) -> np.ndarray:
        texts = list(texts)
        if not texts:
            return np.zeros((0, self.config.hidden_size), np.float32)
        n_instr = self._instr_len(instruction)
        enc = self.tokenizer(
            [instruction + t for t in texts],
            padding=True, truncation=True, max_length=self.max_length,
        )
        input_ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        lengths = mask.sum(axis=1)

        out = np.zeros((len(texts), self.config.hidden_size), np.float32)
        order = np.argsort(lengths, kind="stable")
        i = 0
        while i < len(order):
            bucket = _bucket_for(int(lengths[order[i]]), self.buckets)
            rows = [order[i]]
            i += 1
            while (
                i < len(order)
                and len(rows) < self.batch_size
                and _bucket_for(int(lengths[order[i]]), self.buckets)
                == bucket
            ):
                rows.append(order[i])
                i += 1
            rows = np.asarray(rows)
            B = len(rows)
            bi = np.zeros((self.batch_size, bucket), np.int32)
            bm = np.zeros((self.batch_size, bucket), np.int32)
            L = min(input_ids.shape[1], bucket)
            bi[:B, :L] = input_ids[rows][:, :L]
            bm[:B, :L] = mask[rows][:, :L]
            # context mask: zero the instruction span (keep position 0 —
            # CLS — out too; INSTRUCTOR pools text tokens only)
            ctx = bm.copy()
            ctx[:, : min(n_instr, bucket)] = 0
            out[rows] = self._encode_ctx(bi, bm, ctx)[:B]
        return out

    def _encode_ctx(self, input_ids, attention_mask, ctx_mask) -> np.ndarray:
        hidden = bert_apply(
            self.params, self.config,
            jnp.asarray(input_ids), jnp.asarray(attention_mask),
        )  # (B, T, H) — instruction attends, conditioning the text tokens
        m = jnp.asarray(ctx_mask, jnp.float32)[:, :, None]
        emb = jnp.sum(hidden * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1e-9
        )
        if self.normalize:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
            )
        return np.asarray(emb)


class InstructorEmbeddings:
    """langchain-shape instructor wrapper (reference:
    OptimizedInstructorEmbedding, optimized_instructor_embedding.py:150+):
    embed_documents/embed_query with separate instructions."""

    def __init__(
        self,
        embedder: InstructorEmbedder,
        embed_instruction: str = DEFAULT_EMBED_INSTRUCTION,
        query_instruction: str = DEFAULT_QUERY_INSTRUCTION,
    ):
        self.embedder = embedder
        self.embed_instruction = embed_instruction
        self.query_instruction = query_instruction

    def embed_documents(self, texts: List[str]) -> List[List[float]]:
        return self.embedder.encode_with_instruction(
            texts, self.embed_instruction
        ).tolist()

    def embed_query(self, text: str) -> List[float]:
        return self.embedder.encode_with_instruction(
            [text], self.query_instruction
        )[0].tolist()
