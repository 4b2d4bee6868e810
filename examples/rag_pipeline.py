"""End-to-end RAG example: parse → chunk → encode (INT4 WOQ) → index →
retrieve → rerank → generate.

The north-star path (reference: NeuralChat retrieval plugin,
neural_chat/pipeline/plugins/retrieval/). Run offline with tiny random
models (default) or point --embedding-model / --model at HF checkpoints.

    python examples/rag_pipeline.py --docs ./my_docs --query "what is X?"
"""

from __future__ import annotations

import argparse
import os
import sys

# run straight from a source checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--docs", default=None, help="dir/file of documents")
    p.add_argument("--query", default="what does the MXU do?")
    p.add_argument("--embedding-model", default=None, help="HF encoder name")
    p.add_argument("--model", default=None, help="HF causal LM for generation")
    p.add_argument("--k", type=int, default=3)
    args = p.parse_args()

    import jax

    from intel_extension_for_transformers_tpu.quantization import RtnConfig
    from intel_extension_for_transformers_tpu.retrieval.agent import RetrievalAgent
    from intel_extension_for_transformers_tpu.retrieval.embedder import TextEmbedder

    if args.embedding_model:
        embedder = TextEmbedder.from_pretrained(
            args.embedding_model,
            quantization_config=RtnConfig(weight_dtype="int4", group_size=128),
        )
    else:  # offline demo: random tiny encoder (embeddings are arbitrary)
        from intel_extension_for_transformers_tpu.models.bert import (
            BertConfig,
            bert_init_params,
        )
        from intel_extension_for_transformers_tpu.models.tokenization import (
            ByteTokenizer,
        )

        config = BertConfig.tiny(vocab_size=259)
        params = bert_init_params(jax.random.PRNGKey(0), config)
        embedder = TextEmbedder(params, config, ByteTokenizer())

    docs = args.docs or [
        {"content": "The MXU is the TPU's 128x128 systolic matrix unit; "
                    "matmuls and convolutions run there.", "metadata": {}},
        {"content": "HBM bandwidth usually bounds transformer inference; "
                    "fuse elementwise work into the matmuls.", "metadata": {}},
        {"content": "Weight-only int4 quantization packs two values per "
                    "byte with per-group scales.", "metadata": {}},
    ]
    agent = RetrievalAgent(embedder, input_path=None)
    if isinstance(docs, str):
        agent.create(docs)
    else:
        agent.add_documents(docs)

    ctx = agent.get_context(args.query, k=args.k)
    print(f"top-{args.k} context:")
    for c in ctx:
        print(" -", c["content"][:90])
    prompt = agent.pre_llm_inference_actions(args.query)

    if args.model:
        from intel_extension_for_transformers_tpu import AutoModelForCausalLM
        from intel_extension_for_transformers_tpu.models.generation import (
            SamplingConfig,
            detokenize_stream,
            generate_stream,
        )

        model = AutoModelForCausalLM.from_pretrained(args.model, load_in_4bit=True)
        ids = model.tokenizer(prompt, return_tensors="np")["input_ids"][0]
        stream = generate_stream(
            model.params, model.config, ids,
            SamplingConfig(max_new_tokens=128,
                           eos_token_id=model.tokenizer.eos_token_id),
        )
        for piece in detokenize_stream(stream, model.tokenizer):
            print(piece, end="", flush=True)
        print()
    else:
        print("\n(pass --model <hf-name> to generate an answer)")


if __name__ == "__main__":
    main()
