"""Finetuning + inference workflow: LoRA-tune a causal LM, then benchmark
generation with the tuned adapter (merged and unmerged).

Re-creation of the reference's workflows/hf_finetuning_and_inference_nlp/
(src/run.py: finetune an HF model, then run inference with the result).
TPU version: `Finetuning` (LoRA) over packed text blocks → adapter save →
merge → decode-latency comparison base vs tuned, one script.

    python workflows/hf_finetuning_and_inference_nlp.py          # tiny demo
    python workflows/hf_finetuning_and_inference_nlp.py \
        --model meta-llama/Llama-2-7b-hf --train-file data.txt   # real model
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEMO_TEXTS = [
    "the tensor processing unit multiplies matrices in a systolic array. " * 4,
    "quantization stores weights in four bits with per group scales. " * 4,
    "dense retrieval ranks documents by inner product similarity. " * 4,
    "the compiler fuses elementwise operations into the matmul epilogue. " * 4,
] * 4


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, help="HF name; default tiny demo")
    p.add_argument("--train-file", default=None)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--lora-rank", type=int, default=8)
    p.add_argument("--max-seq-length", type=int, default=64)
    p.add_argument("--gen-tokens", type=int, default=16)
    p.add_argument("--output-dir", default="./finetuned_workflow")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.models.generation import (
        SamplingConfig,
        generate_compiled,
    )
    from intel_extension_for_transformers_tpu.models.llama import (
        LlamaConfig,
        llama_init_params,
    )
    from intel_extension_for_transformers_tpu.models.tokenization import (
        ByteTokenizer,
    )
    from intel_extension_for_transformers_tpu.neural_chat.config import (
        FinetuningConfig,
    )
    from intel_extension_for_transformers_tpu.trainer.finetuning import Finetuning
    from intel_extension_for_transformers_tpu.trainer.lora import (
        attach_lora,
        merge_lora,
    )

    if args.model:
        from intel_extension_for_transformers_tpu.models.auto import (
            AutoModelForCausalLM,
        )

        model = AutoModelForCausalLM.from_pretrained(args.model)
        params, config, tokenizer = model.params, model.config, model.tokenizer
    else:
        config = LlamaConfig.tiny(vocab_size=260)
        params = llama_init_params(jax.random.PRNGKey(0), config)
        tokenizer = ByteTokenizer()

    if args.train_file:
        with open(args.train_file) as f:
            texts = [ln.strip() for ln in f if ln.strip()]
    else:
        texts = DEMO_TEXTS

    cfg = FinetuningConfig(
        lora_rank=args.lora_rank,
        max_steps=args.steps,
        max_seq_length=args.max_seq_length,
        per_device_train_batch_size=2,
        output_dir=args.output_dir,
    )
    t0 = time.time()
    lora, lora_cfg = Finetuning(cfg).finetune(
        params=params, model_config=config, tokenizer=tokenizer, texts=texts
    )
    train_s = time.time() - t0

    # inference: merged adapter vs base, whole-generation compiled
    merged = merge_lora(params, lora, lora_cfg.scaling)
    ids = np.asarray([tokenizer.encode("the tensor")], np.int32)
    samp = SamplingConfig(max_new_tokens=args.gen_tokens)

    def bench(ps):
        toks, _ = generate_compiled(ps, config, jnp.asarray(ids), samp,
                                    jax.random.PRNGKey(0))
        int(np.asarray(toks)[0, 0])
        t0 = time.time()
        toks, _ = generate_compiled(ps, config, jnp.asarray(ids), samp,
                                    jax.random.PRNGKey(1))
        int(np.asarray(toks)[0, 0])
        return (time.time() - t0) / args.gen_tokens * 1e3

    base_ms = bench(params)
    tuned_ms = bench(merged)
    report = {
        "workflow": "hf_finetuning_and_inference_nlp",
        "train_seconds": round(train_s, 2),
        "adapter_dir": cfg.output_dir,
        "base_ms_per_token": round(base_ms, 3),
        "tuned_ms_per_token": round(tuned_ms, 3),
        "adapter_params": int(
            sum(np.asarray(x).size for x in jax.tree.leaves(lora))
        ),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
