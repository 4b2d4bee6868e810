"""Task registry + evaluator — the lm-eval layer over the harness primitives.

Re-creation of the reference's vendored lm-eval task machinery
(reference: transformers/llm/evaluation/evaluator.py:632 `evaluate` task loop;
models/huggingface.py loglikelihood plumbing) sized to this stack: a task is
a dataclass that renders its documents into tokenized requests and reduces
scored results into metrics. Three task FAMILIES cover what the reference's
finetuning/quantization flows actually consume (eval_utils.py, the
accuracy-driven tuning loop trainer.py:190-281):

- multiple-choice (hellaswag/piqa/arc-style): context + N continuations,
  accuracy = argmax length-normalized loglikelihood, plus `acc_norm`.
- greedy continuation (lambada-style): accuracy = the continuation is the
  greedy decode.
- perplexity (wikitext-style): rolling-window ppl over raw text.

No dataset downloads happen here (this environment has no egress): each task
reads local JSONL/text via `data_path`, or falls back to a small bundled
sample so the pipeline is runnable/testable end-to-end. Plug real dumps in
by passing data_path.

API shape follows lm-eval:

    evaluate(params, config, tokenizer,
             tasks=["hellaswag", "lambada", "wikitext"]) → {task: metrics}
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from intel_extension_for_transformers_tpu.evaluation.harness import (
    evaluate_multiple_choice,
    evaluate_perplexity,
    loglikelihood,
)

_TASKS: Dict[str, Callable[..., "Task"]] = {}

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def register_task(name: str):
    def deco(factory):
        _TASKS[name] = factory
        return factory

    return deco


def get_task(name: str, **kw) -> "Task":
    if name not in _TASKS:
        raise KeyError(f"unknown task {name!r}; available: {sorted(_TASKS)}")
    return _TASKS[name](**kw)


def list_tasks() -> List[str]:
    return sorted(_TASKS)


def _encode(tokenizer, text: str) -> List[int]:
    ids = tokenizer.encode(text) if hasattr(tokenizer, "encode") else tokenizer(text)["input_ids"]
    if hasattr(ids, "ids"):
        ids = ids.ids
    return [int(i) for i in np.asarray(ids).reshape(-1)]


def _read_jsonl(path: str) -> List[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


@dataclass
class Task:
    """Base: subclasses implement evaluate()."""

    name: str = "task"

    def evaluate(self, params, config, tokenizer, *, batch_size: int = 8) -> dict:
        raise NotImplementedError


@dataclass
class MultipleChoiceTask(Task):
    """Docs: {"context": str, "choices": [str, ...], "gold": int}.

    Metrics match lm-eval: `acc` (raw ll argmax) and `acc_norm`
    (length-normalized ll argmax — what hellaswag reports)."""

    docs: List[dict] = field(default_factory=list)

    @classmethod
    def from_jsonl(cls, name: str, path: str) -> "MultipleChoiceTask":
        return cls(name=name, docs=_read_jsonl(path))

    def evaluate(self, params, config, tokenizer, *, batch_size: int = 8) -> dict:
        questions = []
        for d in self.docs:
            ctx = _encode(tokenizer, d["context"])
            # choices tokenized as continuations (leading space, lm-eval style)
            choices = [
                _encode(tokenizer, c if c.startswith(" ") else " " + c)
                for c in d["choices"]
            ]
            questions.append({"context": ctx, "choices": choices, "gold": d["gold"]})
        raw = evaluate_multiple_choice(
            params, config, questions, batch_size=batch_size, length_normalize=False
        )
        norm = evaluate_multiple_choice(
            params, config, questions, batch_size=batch_size, length_normalize=True
        )
        return {"acc": raw["accuracy"], "acc_norm": norm["accuracy"], "n": raw["n"]}


@dataclass
class GreedyContinuationTask(Task):
    """Lambada-style: predict the final word of each passage greedily.

    Docs: {"text": str} — split on the last space; metric `acc` = the
    continuation tokens are all greedy, `ppl` over the continuation."""

    docs: List[dict] = field(default_factory=list)

    @classmethod
    def from_jsonl(cls, name: str, path: str) -> "GreedyContinuationTask":
        return cls(name=name, docs=_read_jsonl(path))

    def evaluate(self, params, config, tokenizer, *, batch_size: int = 8) -> dict:
        reqs = []
        for d in self.docs:
            text = d["text"].rstrip()
            head, _, last = text.rpartition(" ")
            reqs.append((_encode(tokenizer, head), _encode(tokenizer, " " + last)))
        scored = loglikelihood(params, config, reqs, batch_size=batch_size)
        n = max(len(scored), 1)
        acc = sum(bool(g) for _, g in scored) / n
        total_tokens = sum(len(c) for _, c in reqs) or 1
        nll = -sum(ll for ll, _ in scored) / total_tokens
        return {"acc": acc, "ppl": float(np.exp(min(nll, 30.0))), "n": len(scored)}


@dataclass
class PerplexityTask(Task):
    """Wikitext-style rolling perplexity over raw text."""

    text: str = ""
    window: int = 256
    stride: int = 256

    @classmethod
    def from_file(cls, name: str, path: str, **kw) -> "PerplexityTask":
        with open(path) as f:
            return cls(name=name, text=f.read(), **kw)

    def evaluate(self, params, config, tokenizer, *, batch_size: int = 8) -> dict:
        ids = _encode(tokenizer, self.text)
        out = evaluate_perplexity(
            params, config, ids,
            window=self.window, stride=self.stride, batch_size=batch_size,
        )
        return {"ppl": out["perplexity"], "nll": out["nll"], "tokens": out["tokens"]}


@dataclass
class WinograndeTask(Task):
    """Winogrande partial evaluation (lm-eval convention): the blank is
    substituted with each option, the context is everything up to and
    including the substituted option, and the scored continuation is the
    remainder of the sentence — so the options compete on the SAME
    continuation text.

    Docs: {"sentence": "... _ ...", "option1", "option2", "answer": "1"|"2"}.
    """

    docs: List[dict] = field(default_factory=list)

    @classmethod
    def from_jsonl(cls, name: str, path: str) -> "WinograndeTask":
        return cls(name=name, docs=_read_jsonl(path))

    def evaluate(self, params, config, tokenizer, *, batch_size: int = 8) -> dict:
        reqs, golds, idx = [], [], []
        for i, d in enumerate(self.docs):
            head, _, tail = d["sentence"].partition("_")
            for opt in (d["option1"], d["option2"]):
                ctx = (head + opt).rstrip()
                reqs.append((_encode(tokenizer, ctx), _encode(tokenizer, tail)))
                idx.append(i)
            golds.append(int(d["answer"]) - 1)
        scored = loglikelihood(params, config, reqs, batch_size=batch_size)
        correct = 0
        for i, gold in enumerate(golds):
            lls = [ll for (ll, _), j in zip(scored, idx) if j == i]
            correct += int(int(np.argmax(lls)) == gold)
        n = max(len(golds), 1)
        return {"acc": correct / n, "n": len(golds)}


# ------------------------- bundled task factories -------------------------


def _mc_from_raw(name: str, path: str, to_doc) -> MultipleChoiceTask:
    """Adapt a raw lm-eval doc schema into {context, choices, gold} docs."""
    return MultipleChoiceTask(name=name, docs=[to_doc(d) for d in _read_jsonl(path)])


def _arc_doc(d: dict) -> dict:
    labels = d["choices"]["label"]
    return {
        "context": f"Question: {d['question']}\nAnswer:",
        "choices": d["choices"]["text"],
        "gold": labels.index(d["answerKey"]),
    }


@register_task("arc_easy")
def _arc_easy(data_path: Optional[str] = None, **kw) -> MultipleChoiceTask:
    path = data_path or os.path.join(_DATA_DIR, "arc_sample.jsonl")
    return _mc_from_raw("arc_easy", path, _arc_doc)


@register_task("arc_challenge")
def _arc_challenge(data_path: Optional[str] = None, **kw) -> MultipleChoiceTask:
    path = data_path or os.path.join(_DATA_DIR, "arc_sample.jsonl")
    return _mc_from_raw("arc_challenge", path, _arc_doc)


@register_task("boolq")
def _boolq(data_path: Optional[str] = None, **kw) -> MultipleChoiceTask:
    path = data_path or os.path.join(_DATA_DIR, "boolq_sample.jsonl")

    def to_doc(d):
        return {
            "context": f"{d['passage']}\nQuestion: {d['question']}?\nAnswer:",
            "choices": ["no", "yes"],
            "gold": int(bool(d["answer"])),
        }

    return _mc_from_raw("boolq", path, to_doc)


@register_task("winogrande")
def _winogrande(data_path: Optional[str] = None, **kw) -> WinograndeTask:
    path = data_path or os.path.join(_DATA_DIR, "winogrande_sample.jsonl")
    return WinograndeTask.from_jsonl("winogrande", path)


@register_task("openbookqa")
def _openbookqa(data_path: Optional[str] = None, **kw) -> MultipleChoiceTask:
    path = data_path or os.path.join(_DATA_DIR, "openbookqa_sample.jsonl")

    def to_doc(d):
        labels = d["choices"]["label"]
        return {
            "context": d["question_stem"],
            "choices": d["choices"]["text"],
            "gold": labels.index(d["answerKey"]),
        }

    return _mc_from_raw("openbookqa", path, to_doc)


@register_task("copa")
def _copa(data_path: Optional[str] = None, **kw) -> MultipleChoiceTask:
    path = data_path or os.path.join(_DATA_DIR, "copa_sample.jsonl")

    def to_doc(d):
        conn = "because" if d["question"] == "cause" else "therefore"
        ctx = d["premise"].rstrip(". ") + f" {conn}"
        lower = [c[0].lower() + c[1:] for c in (d["choice1"], d["choice2"])]
        return {"context": ctx, "choices": lower, "gold": int(d["label"])}

    return _mc_from_raw("copa", path, to_doc)


@register_task("sciq")
def _sciq(data_path: Optional[str] = None, **kw) -> MultipleChoiceTask:
    path = data_path or os.path.join(_DATA_DIR, "sciq_sample.jsonl")

    def to_doc(d):
        choices = [
            d["distractor1"], d["distractor2"], d["distractor3"],
            d["correct_answer"],
        ]
        return {
            "context": f"Question: {d['question']}\nAnswer:",
            "choices": choices,
            "gold": 3,
        }

    return _mc_from_raw("sciq", path, to_doc)


@register_task("truthfulqa_mc1")
def _truthfulqa_mc1(data_path: Optional[str] = None, **kw) -> MultipleChoiceTask:
    path = data_path or os.path.join(_DATA_DIR, "truthfulqa_sample.jsonl")

    def to_doc(d):
        t = d["mc1_targets"]
        return {
            "context": f"Q: {d['question']}\nA:",
            "choices": t["choices"],
            "gold": t["labels"].index(1),
        }

    return _mc_from_raw("truthfulqa_mc1", path, to_doc)


@register_task("mmlu")
def _mmlu(data_path: Optional[str] = None, **kw) -> MultipleChoiceTask:
    """MMLU letter-choice convention: the options are spelled out in the
    prompt and the SCORED continuations are the answer letters."""
    path = data_path or os.path.join(_DATA_DIR, "mmlu_sample.jsonl")

    def to_doc(d):
        letters = ["A", "B", "C", "D"]
        subject = d.get("subject", "knowledge").replace("_", " ")
        lines = "\n".join(
            f"{letter}. {c}" for letter, c in zip(letters, d["choices"])
        )
        ctx = (
            f"The following are multiple choice questions (with answers) "
            f"about {subject}.\n\n{d['question']}\n{lines}\nAnswer:"
        )
        return {"context": ctx, "choices": letters[: len(d["choices"])],
                "gold": int(d["answer"])}

    return _mc_from_raw("mmlu", path, to_doc)


@register_task("hellaswag")
def _hellaswag(data_path: Optional[str] = None, **kw) -> MultipleChoiceTask:
    path = data_path or os.path.join(_DATA_DIR, "hellaswag_sample.jsonl")
    return MultipleChoiceTask.from_jsonl("hellaswag", path)


@register_task("piqa")
def _piqa(data_path: Optional[str] = None, **kw) -> MultipleChoiceTask:
    path = data_path or os.path.join(_DATA_DIR, "piqa_sample.jsonl")
    return MultipleChoiceTask.from_jsonl("piqa", path)


@register_task("lambada")
def _lambada(data_path: Optional[str] = None, **kw) -> GreedyContinuationTask:
    path = data_path or os.path.join(_DATA_DIR, "lambada_sample.jsonl")
    return GreedyContinuationTask.from_jsonl("lambada", path)


@register_task("wikitext")
def _wikitext(data_path: Optional[str] = None, **kw) -> PerplexityTask:
    path = data_path or os.path.join(_DATA_DIR, "wikitext_sample.txt")
    return PerplexityTask.from_file("wikitext", path, **kw)


# ------------------------------- evaluator -------------------------------


def evaluate(
    params,
    config,
    tokenizer,
    tasks: Sequence,
    *,
    batch_size: int = 8,
    data_paths: Optional[Dict[str, str]] = None,
) -> Dict[str, dict]:
    """Run tasks (names or Task objects) → {task_name: metrics}
    (reference: evaluator.py:632 `evaluate(lm, task_dict, ...)`)."""
    results: Dict[str, dict] = {}
    for t in tasks:
        if isinstance(t, str):
            kw = {}
            if data_paths and t in data_paths:
                kw["data_path"] = data_paths[t]
            t = get_task(t, **kw)
        results[t.name] = t.evaluate(params, config, tokenizer, batch_size=batch_size)
    return results
