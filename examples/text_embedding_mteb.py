"""Text-embedding deployment example (MTEB/BGE-style).

Mirrors the reference's Neural Engine BGE deployment **[RAG-critical]**
(reference: examples/huggingface/pytorch/text-embedding/deployment/mteb/bge/
engine_model.py:81-176 — tokenize → engine inference → cls-pool →
normalize): encode a corpus + queries with the INT4-WOQ encoder, build the
on-HBM index, and report recall@k of quantized vs float encodings.

    python examples/text_embedding_mteb.py                    # offline demo
    python examples/text_embedding_mteb.py --model BAAI/bge-base-en-v1.5
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None)
    p.add_argument("--n-docs", type=int, default=256)
    p.add_argument("--k", type=int, default=10)
    args = p.parse_args()

    import jax

    from intel_extension_for_transformers_tpu.models.bert import (
        BertConfig,
        bert_init_params,
    )
    from intel_extension_for_transformers_tpu.models.tokenization import (
        ByteTokenizer,
    )
    from intel_extension_for_transformers_tpu.quantization import (
        RtnConfig,
        quantize_model,
    )
    from intel_extension_for_transformers_tpu.retrieval.embedder import TextEmbedder
    from intel_extension_for_transformers_tpu.retrieval.index import FlatIndex

    if args.model:
        fp = TextEmbedder.from_pretrained(args.model)
        q4 = TextEmbedder.from_pretrained(
            args.model,
            quantization_config=RtnConfig(weight_dtype="int4", group_size=128),
        )
    else:
        config = BertConfig.tiny(vocab_size=259, hidden_size=128)
        params = bert_init_params(jax.random.PRNGKey(0), config)
        tok = ByteTokenizer()
        fp = TextEmbedder(params, config, tok)
        q4 = TextEmbedder(
            quantize_model(
                params, RtnConfig(weight_dtype="int4", group_size=32)
            ).params,
            config,
            tok,
        )

    rng = np.random.default_rng(0)
    # distinct random strings: a RANDOM demo encoder maps similar word-soup
    # texts to nearly-collinear embeddings, which makes recall degenerate
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    docs = ["".join(rng.choice(alphabet, size=80)) for _ in range(args.n_docs)]

    ref_emb = np.asarray(fp.encode(docs))
    q_emb = np.asarray(q4.encode(docs))

    # a random demo encoder emits nearly-collinear embeddings (offdiag
    # cosine ~0.9999) which bf16 cannot rank — use f32 offline; trained
    # encoders spread, and the bf16 index holds recall 0.991 there (bench.py)
    idx = FlatIndex(dim=q_emb.shape[1],
                    dtype="bfloat16" if args.model else "float32")
    idx.add(q_emb)

    queries = docs[:64]
    q_query = np.asarray(q4.encode(queries))
    _, got = idx.search(q_query, k=args.k)
    got = np.asarray(got)

    def recall(oracle):
        hits = sum(
            len(set(got[i].tolist()) & set(oracle[i].tolist()))
            for i in range(len(queries))
        )
        return hits / oracle.size

    # index recall: same (int4) embeddings, bf16 on-HBM index vs exact f32
    idx_oracle = np.argsort(-(q_query @ q_emb.T), axis=1)[:, : args.k]
    print(f"index recall@{args.k} (on-HBM index vs exact f32): "
          f"{recall(idx_oracle):.3f}  ({len(docs)} docs)")

    # encoder recall: INT4 encoder vs the FLOAT encoder's neighbors —
    # meaningful with a trained model (--model); a random demo encoder has
    # no semantic structure so this prints low offline
    enc_oracle = np.argsort(-(ref_emb[:64] @ ref_emb.T), axis=1)[:, : args.k]
    print(f"encoder recall@{args.k} (INT4 enc vs float-enc oracle): "
          f"{recall(enc_oracle):.3f}")


if __name__ == "__main__":
    main()
