"""BM25 sparse retriever (host-side; lexical recall complement to dense).

Parity with the reference's bm25 retrieval type
(reference: retrieval_agent.py:92-96 "default/child_parent/bm25" — it uses
langchain's BM25Retriever). Okapi BM25 with k1/b defaults, numpy scoring over
a CSR-ish postings layout; corpora at RAG scale (≤ millions of chunks) score
in milliseconds on host while the TPU handles the dense path.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import List, Optional

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> List[str]:
    return _TOKEN_RE.findall(text.lower())


class BM25Retriever:
    def __init__(self, k1: float = 1.5, b: float = 0.75, prefer_native: bool = True):
        self.k1 = k1
        self.b = b
        self.docs: List[dict] = []
        self._df: Counter = Counter()
        self._tf: List[Counter] = []
        self._doc_len: List[int] = []
        self._avgdl: float = 0.0
        self._native = None
        if prefer_native:
            from intel_extension_for_transformers_tpu import native

            if native.available():
                self._native = native.BM25Native(k1, b)

    @classmethod
    def from_documents(cls, docs: List[dict], **kw) -> "BM25Retriever":
        r = cls(**kw)
        r.add_documents(docs)
        return r

    def add_documents(self, docs: List[dict]) -> None:
        for d in docs:
            if self._native is not None:
                self._native.add(d["content"])
            else:
                toks = tokenize(d["content"])
                tf = Counter(toks)
                self._tf.append(tf)
                self._doc_len.append(len(toks))
                for t in tf:
                    self._df[t] += 1
            self.docs.append(d)
        if self._native is None:
            self._avgdl = float(np.mean(self._doc_len)) if self._doc_len else 0.0

    def _idf(self, term: str) -> float:
        n = len(self.docs)
        df = self._df.get(term, 0)
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def score(self, query: str) -> np.ndarray:
        if self._native is not None:
            ids, scores = self._native.query(query, len(self.docs))
            out = np.zeros(len(self.docs), np.float32)
            out[ids] = scores
            return out
        q_terms = tokenize(query)
        scores = np.zeros(len(self.docs), np.float32)
        for t in q_terms:
            idf = self._idf(t)
            if idf <= 0:
                continue
            for i, tf in enumerate(self._tf):
                f = tf.get(t, 0)
                if f:
                    dl = self._doc_len[i]
                    denom = f + self.k1 * (1 - self.b + self.b * dl / max(self._avgdl, 1e-9))
                    scores[i] += idf * f * (self.k1 + 1) / denom
        return scores

    def get_relevant_documents(self, query: str, k: int = 4) -> List[dict]:
        if not self.docs:
            return []
        if self._native is not None:
            ids, scores = self._native.query(query, k)
            hits = [self.docs[i] for i, s in zip(ids, scores) if s > 0]
            return hits or [self.docs[i] for i in ids]
        scores = self.score(query)
        top = np.argsort(-scores)[:k]
        return [self.docs[i] for i in top if scores[i] > 0] or [
            self.docs[i] for i in top
        ]
