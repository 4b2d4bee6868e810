"""Cross-encoder reranker: batched XLA rerank stage.

Replaces the reference's FlagReranker wrapper
(reference: langchain_community/retrievers/bge_reranker.py:28-75 —
`BgeReranker.compress_documents` scores (query, doc) pairs with a
cross-encoder and keeps top_n). Here scoring is a jit-compiled BERT-pair
forward: [CLS] query [SEP] doc [SEP] → pooled → linear → score, batched and
bucket-padded like the embedder.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.bert import BertConfig, bert_apply
from intel_extension_for_transformers_tpu.ops.layers import dense
from intel_extension_for_transformers_tpu.retrieval.embedder import SimpleTokenizer


class CrossEncoderReranker:
    """params = BERT tree + {"classifier": {kernel (H,1), bias}}."""

    def __init__(
        self,
        params,
        config: BertConfig,
        tokenizer=None,
        *,
        batch_size: int = 64,
        max_length: int = 512,
    ):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer or SimpleTokenizer(config.vocab_size)
        self.batch_size = batch_size
        self.max_length = max_length

    @classmethod
    def from_pretrained(cls, model_name_or_path: str, **kw) -> "CrossEncoderReranker":
        import transformers

        from intel_extension_for_transformers_tpu.models.hf_convert import (
            bert_params_from_hf,
            _lin,
        )

        hf = transformers.AutoModelForSequenceClassification.from_pretrained(
            model_name_or_path
        )
        params, config = bert_params_from_hf(hf.bert)
        sd = hf.state_dict()
        params["classifier"] = _lin(sd, "classifier")
        tok = transformers.AutoTokenizer.from_pretrained(model_name_or_path)
        return cls(params, config, tok, **kw)

    def _score_batch(self, input_ids, attention_mask, token_type_ids) -> np.ndarray:
        hidden = bert_apply(
            self.params,
            self.config,
            jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
            jnp.asarray(token_type_ids),
        )
        cls = hidden[:, 0, :]
        if "pooler" in self.params:
            cls = jnp.tanh(
                dense(cls, self.params["pooler"]["kernel"], self.params["pooler"]["bias"])
            )
        logits = dense(
            cls,
            self.params["classifier"]["kernel"],
            self.params["classifier"].get("bias"),
        )
        return np.asarray(logits[:, 0])

    def _tokenize_pair(self, query: str, doc: str):
        if hasattr(self.tokenizer, "encode_one"):  # SimpleTokenizer
            q = self.tokenizer.encode_one(query, self.max_length // 2)
            d = self.tokenizer.encode_one(doc, self.max_length // 2)[1:]  # drop CLS
            ids = q + d
            types = [0] * len(q) + [1] * len(d)
            return ids, types
        enc = self.tokenizer(
            query, doc, truncation=True, max_length=self.max_length
        )
        return enc["input_ids"], enc.get(
            "token_type_ids", [0] * len(enc["input_ids"])
        )

    def score(self, query: str, docs: List[str]) -> np.ndarray:
        """Relevance score per (query, doc) pair."""
        pairs = [self._tokenize_pair(query, d) for d in docs]
        L = max(len(p[0]) for p in pairs)
        L = min(L, self.max_length)
        scores = np.zeros((len(docs),), np.float32)
        for i0 in range(0, len(pairs), self.batch_size):
            chunk = pairs[i0 : i0 + self.batch_size]
            B = len(chunk)
            ids = np.zeros((B, L), np.int32)
            mask = np.zeros((B, L), np.int32)
            types = np.zeros((B, L), np.int32)
            for j, (pid, pty) in enumerate(chunk):
                n = min(len(pid), L)
                ids[j, :n] = pid[:n]
                mask[j, :n] = 1
                types[j, :n] = pty[:n]
            scores[i0 : i0 + B] = self._score_batch(ids, mask, types)
        return scores

    def rerank(
        self, query: str, docs: List[dict], top_n: int = 3
    ) -> List[dict]:
        """compress_documents parity (reference: bge_reranker.py:33-75):
        score, sort desc, keep top_n, attach relevance_score metadata."""
        if not docs:
            return []
        scores = self.score(query, [d["content"] for d in docs])
        order = np.argsort(-scores)[:top_n]
        out = []
        for i in order:
            d = dict(docs[int(i)])
            md = dict(d.get("metadata", {}))
            md["relevance_score"] = float(scores[int(i)])
            d["metadata"] = md
            out.append(d)
        return out
