"""DLSA: end-to-end Document-Level Sentiment Analysis workflow.

Re-creation of the reference's dlsa workflow (reference: workflows/dlsa/ —
README.md:9-17: fine-tune → quantize → inference benchmark, the "E2E
sentiment" pipeline). TPU version: SetFit few-shot fit (or full finetune) of
the encoder classifier → INT8/INT4 quantize → throughput benchmark, one
script.

    python workflows/dlsa_sentiment.py                 # offline tiny demo
    python workflows/dlsa_sentiment.py --model BAAI/bge-small-en-v1.5 \
        --train-csv data.csv                           # real encoder
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEMO = [
    ("the movie was wonderful and fun", "pos"),
    ("a delightful heartwarming film", "pos"),
    ("truly great acting and story", "pos"),
    ("absolutely loved every minute", "pos"),
    ("terrible boring waste of time", "neg"),
    ("awful film with bad acting", "neg"),
    ("dreadful and painfully slow", "neg"),
    ("i hated this disaster", "neg"),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, help="HF encoder checkpoint")
    p.add_argument("--train-csv", default=None, help="csv with text,label")
    p.add_argument("--quant-dtype", default="int8", choices=["int8", "int4"])
    p.add_argument("--bench-batch", type=int, default=32)
    args = p.parse_args()

    import jax

    from intel_extension_for_transformers_tpu.quantization import (
        RtnConfig,
        quantize_model,
    )
    from intel_extension_for_transformers_tpu.setfit import (
        SetFitModel,
        SetFitTrainer,
    )
    from intel_extension_for_transformers_tpu.setfit.setfit import (
        SetFitTrainingArguments,
    )
    from intel_extension_for_transformers_tpu.utils.profiling import StageTimer

    timer = StageTimer(verbose=True)

    # ---- data
    if args.train_csv:
        with open(args.train_csv) as f:
            rows = [(r[0], r[1]) for r in csv.reader(f)]
    else:
        rows = DEMO
    texts = [t for t, _ in rows]
    labels = [l for _, l in rows]
    names = sorted(set(labels))

    # ---- model
    with timer.stage("load"):
        if args.model:
            from intel_extension_for_transformers_tpu.retrieval.embedder import (
                TextEmbedder,
            )

            emb = TextEmbedder.from_pretrained(args.model)
            model = SetFitModel(emb.params, emb.config, emb.tokenizer)
        else:
            from intel_extension_for_transformers_tpu.models.bert import (
                BertConfig,
                bert_init_params,
            )
            from intel_extension_for_transformers_tpu.models.tokenization import (
                ByteTokenizer,
            )

            cfg = BertConfig.tiny(vocab_size=259)
            model = SetFitModel(
                bert_init_params(jax.random.PRNGKey(0), cfg), cfg,
                ByteTokenizer(),
            )

    # ---- train (few-shot)
    with timer.stage("train", n=len(texts)):
        SetFitTrainer(
            model,
            SetFitTrainingArguments(num_pairs=4, head_steps=100, batch_size=8,
                                    max_length=64),
        ).train(texts, labels, label_names=names)
    train_acc = float(
        np.mean([p == l for p, l in zip(model.predict(texts), labels)])
    )

    # ---- quantize
    with timer.stage("quantize", dtype=args.quant_dtype):
        qp = quantize_model(
            model.encoder_params,
            RtnConfig(weight_dtype=args.quant_dtype, group_size=32),
        )
        model.encoder_params = qp.params
    quant_acc = float(
        np.mean([p == l for p, l in zip(model.predict(texts), labels)])
    )

    # ---- inference benchmark
    batch = (texts * ((args.bench_batch // len(texts)) + 1))[: args.bench_batch]
    model.predict(batch)  # compile
    with timer.stage("inference", batch=len(batch)):
        t0 = time.perf_counter()
        for _ in range(5):
            model.predict(batch)
        dt = (time.perf_counter() - t0) / 5

    print(json.dumps({
        "workflow": "dlsa_sentiment",
        "train_accuracy": train_acc,
        f"{args.quant_dtype}_accuracy": quant_acc,
        "classify_docs_per_s": round(len(batch) / dt, 1),
        "stage_ms": {k: round(v, 1) for k, v in timer.totals().items()},
    }))


if __name__ == "__main__":
    main()
