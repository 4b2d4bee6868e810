"""Token-classification NER on the BERT backbone + time resolution.

TPU-native replacement for the reference's spacy NER plugin
(reference: neural_chat/pipeline/plugins/ner/ner.py — spacy en_core_web_lg
inference; utils/process_text.py — DATE/TIME pairing into periods and
last-week/last-month resolution). Instead of shipping a spacy dependency,
the tagger is our own BERT encoder (models/bert.py) with a
token-classification head — one jitted forward, BIO decoding on host — and
an HF converter for `BertForTokenClassification` checkpoints (e.g.
dslim/bert-base-NER) so trained weights drop in.

The time logic (`process_time`/`process_entities` analogues) is re-derived
from the reference's published behavior, not copied: DATE entities carrying
digits pair into {from, to} periods around the word "to", odd period lists
collapse back into plain times, and "last week"/"last month" queries resolve
to absolute date ranges (reference: ner/utils/process_text.py:41-103).
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass
from datetime import timedelta
from functools import partial
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.bert import (
    BertConfig,
    bert_apply,
    bert_init_params,
)
from intel_extension_for_transformers_tpu.ops.layers import dense

# CoNLL-style BIO tags + DATE/TIME (what the chat plugin consumes). The HF
# converter remaps a checkpoint's own id2label onto its head, so trained
# checkpoints keep their native label set.
DEFAULT_LABELS = (
    "O",
    "B-PER", "I-PER",
    "B-ORG", "I-ORG",
    "B-LOC", "I-LOC",
    "B-MISC", "I-MISC",
    "B-DATE", "I-DATE",
    "B-TIME", "I-TIME",
)


@dataclass(frozen=True)
class NerConfig:
    bert: BertConfig
    labels: tuple = DEFAULT_LABELS

    @property
    def num_labels(self) -> int:
        return len(self.labels)

    @classmethod
    def tiny(cls, **kw):
        return cls(bert=BertConfig.tiny(**kw))


def ner_init_params(rng: jax.Array, config: NerConfig) -> dict:
    r1, r2 = jax.random.split(rng)
    params = bert_init_params(r1, config.bert)
    h, L = config.bert.hidden_size, config.num_labels
    params["classifier"] = {
        "kernel": jax.random.normal(r2, (h, L), jnp.float32) * 0.02,
        "bias": jnp.zeros((L,), jnp.float32),
    }
    return params


@partial(jax.jit, static_argnames=("config",))
def ner_apply(
    params: dict,
    config: NerConfig,
    input_ids: jax.Array,  # (B, T)
    attention_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """→ per-token label logits (B, T, num_labels)."""
    hidden = bert_apply(params, config.bert, input_ids, attention_mask)
    return dense(hidden, params["classifier"]["kernel"], params["classifier"]["bias"])


def ner_params_from_hf(hf_model) -> tuple[dict, NerConfig]:
    """Convert a transformers BertForTokenClassification to our tree."""
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        bert_params_from_hf,
        _lin,
        _np,  # noqa: F401 — same conversion conventions as the backbone
    )

    params, bert_config = bert_params_from_hf(hf_model)
    sd = hf_model.state_dict()
    params["classifier"] = _lin(sd, "classifier")
    id2label = getattr(hf_model.config, "id2label", None) or {}
    labels = tuple(
        id2label.get(i, id2label.get(str(i), f"LABEL_{i}"))
        for i in range(hf_model.config.num_labels)
    )
    return params, NerConfig(bert=bert_config, labels=labels)


@dataclass
class Entity:
    text: str
    label: str  # PER / ORG / LOC / MISC / DATE / TIME
    start: int
    end: int
    score: float = 1.0


def decode_bio(
    labels: Sequence[str],
    offsets: Sequence[tuple],
    text: str,
    scores: Optional[Sequence[float]] = None,
) -> List[Entity]:
    """BIO label sequence + char offsets → entity spans.

    `offsets` are (start, end) per token; (0, 0) marks special tokens."""
    out: List[Entity] = []
    cur = None  # (label, start, end, score_sum, count)
    for i, lab in enumerate(labels):
        s, e = offsets[i]
        sc = float(scores[i]) if scores is not None else 1.0
        special = s == e
        tag, _, ent = lab.partition("-")
        if special or tag == "O" or not ent:
            if cur is not None:
                out.append(Entity(text[cur[1]:cur[2]], cur[0], cur[1], cur[2],
                                  cur[3] / cur[4]))
                cur = None
            continue
        if tag == "B" or cur is None or cur[0] != ent:
            if cur is not None:
                out.append(Entity(text[cur[1]:cur[2]], cur[0], cur[1], cur[2],
                                  cur[3] / cur[4]))
            cur = (ent, s, e, sc, 1)
        else:  # I- continuation
            cur = (cur[0], cur[1], e, cur[3] + sc, cur[4] + 1)
    if cur is not None:
        out.append(Entity(text[cur[1]:cur[2]], cur[0], cur[1], cur[2],
                          cur[3] / cur[4]))
    return out


class NerModel:
    """BERT-token-classification tagger with a whitespace/offset frontend.

    `tokenizer` must expose `encode(text) → ids` plus either offsets
    (tokenizers library) or a deterministic per-token mapping; the built-in
    fallback is a regex word splitter mapped through a vocab callable, good
    enough for tests and byte-level vocabularies.
    """

    def __init__(self, params, config: NerConfig, tokenizer=None, max_length=256):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.max_length = max_length

    @classmethod
    def from_pretrained(cls, name_or_path: str, tokenizer=None, **kw):
        import transformers

        hf = transformers.AutoModelForTokenClassification.from_pretrained(
            name_or_path
        )
        params, config = ner_params_from_hf(hf)
        if tokenizer is None:
            tokenizer = transformers.AutoTokenizer.from_pretrained(name_or_path)
        return cls(params, config, tokenizer, **kw)

    # -- tokenization with char offsets --
    _WORD = re.compile(r"\w+(?:[.'’]\w+)*|\S")

    def _encode_with_offsets(self, text: str):
        tok = self.tokenizer
        if tok is not None and hasattr(tok, "encode"):
            enc = tok.encode(text)
            if hasattr(enc, "offsets"):  # tokenizers.Encoding
                return list(enc.ids), list(enc.offsets)
        # fallback: regex words, ids via hash into the vocab (deterministic)
        words = list(self._WORD.finditer(text))
        V = self.config.bert.vocab_size
        ids = [(hash(m.group()) % (V - 1)) + 1 for m in words]
        offsets = [(m.start(), m.end()) for m in words]
        return ids, offsets

    def tag(self, text: str) -> List[Entity]:
        ids, offsets = self._encode_with_offsets(text)
        ids = ids[: self.max_length]
        offsets = offsets[: self.max_length]
        if not ids:
            return []
        arr = jnp.asarray(np.asarray(ids, np.int32)[None])
        mask = jnp.ones_like(arr)
        logits = np.asarray(ner_apply(self.params, self.config, arr, mask)[0])
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        pred = probs.argmax(-1)
        labels = [self.config.labels[int(i)] for i in pred]
        scores = [float(probs[i, int(pred[i])]) for i in range(len(pred))]
        return decode_bio(labels, offsets, text, scores)


# ------------------------- time resolution -------------------------

_MONTH_DAYS = [31, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30]


def _last_month_period(today=None) -> List[dict]:
    to_time = today or datetime.datetime.today()
    from_time = to_time - timedelta(days=_MONTH_DAYS[to_time.month - 1])
    return [{"from": str(from_time)[:10], "to": str(to_time)[:10]}]


def _last_week_period(today=None) -> List[dict]:
    to_time = today or datetime.datetime.today()
    from_time = to_time - timedelta(days=7)
    return [{"from": str(from_time)[:10], "to": str(to_time)[:10]}]


def resolve_times(text: str, date_entities: Sequence[str]) -> dict:
    """DATE mentions → {"time": [...], "period": [{from,to}...]}.

    Reference-parity pairing rules (ner/utils/process_text.py:41-61): only
    digit-bearing DATEs count; around the word "to" they pair into periods
    ("3 May to 5 May" → one period, two adjacent DATE mentions → one
    period); an odd leftover collapses everything back into plain times.
    """
    times: List[str] = []
    periods: List[str] = []
    for ent in date_entities:
        if not re.search(r"\d", ent):
            continue
        if "to" in text:
            if " to " in ent:
                periods.extend(ent.split(" to "))
            elif periods and periods[-1] == ent:
                periods.pop()
            else:
                periods.append(ent)
        else:
            times.append(ent)
    if len(periods) % 2 != 0:
        times = sorted(set(times + periods))
        periods = []
    result_period = [
        {"from": periods[2 * i], "to": periods[2 * i + 1]}
        for i in range(len(periods) // 2)
    ]
    return {"time": times, "period": result_period}


def ner_result(
    query: str,
    entities: Sequence[Entity],
    today: Optional[datetime.datetime] = None,
) -> dict:
    """Entities → the reference's result shape
    (ner/utils/process_text.py:64-103): {period, time, location, name,
    organization} with last-week/last-month post-processing on the query."""
    location, name, organization, dates = [], [], [], []
    for e in entities:
        lab = e.label.upper()
        if lab in ("LOC", "GPE"):
            location.append(e.text)
        elif lab == "PER" or lab == "PERSON":
            name.append(e.text)
        elif lab == "ORG":
            organization.append(e.text)
        elif lab in ("DATE", "TIME"):
            dates.append(e.text)
    mentioned = resolve_times(query, dates) if dates else {"time": [], "period": []}
    result_period = mentioned["period"]
    if "last month" in query:
        result_period = _last_month_period(today)
    if "last week" in query:
        result_period = _last_week_period(today)
    return {
        "period": result_period,
        "time": mentioned["time"],
        "location": sorted(set(location)),
        "name": name,
        "organization": organization,
    }
