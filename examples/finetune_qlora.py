"""QLoRA finetuning: train a rank-r adapter on a frozen INT4/NF4 base.

Reference workflow: finetune_model(BaseFinetuningConfig) with QLoRA
(reference: neural_chat/chatbot.py:316 + llm/finetuning/finetuning.py
QLoRA-on-4bit-base path).

    python examples/finetune_qlora.py --model facebook/opt-125m \
        --train-file data.txt --qlora --max-steps 100
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None)
    p.add_argument("--train-file", default=None)
    p.add_argument("--qlora", action="store_true")
    p.add_argument("--lora-rank", type=int, default=8)
    p.add_argument("--max-steps", type=int, default=50)
    p.add_argument("--output-dir", default="./adapter_out")
    args = p.parse_args()

    from intel_extension_for_transformers_tpu.neural_chat.config import (
        FinetuningConfig,
    )
    from intel_extension_for_transformers_tpu.trainer import Finetuning

    cfg = FinetuningConfig(
        model_name_or_path=args.model or "tiny",
        train_file=args.train_file,
        lora_rank=args.lora_rank,
        qlora=args.qlora,
        max_steps=args.max_steps,
        output_dir=args.output_dir,
    )
    ft = Finetuning(cfg)
    if args.model:
        lora, lora_cfg = ft.finetune()
    else:  # offline demo on a tiny random llama + byte tokenizer
        import jax

        from intel_extension_for_transformers_tpu.models.llama import (
            LlamaConfig,
            llama_init_params,
        )
        from intel_extension_for_transformers_tpu.models.tokenization import (
            ByteTokenizer,
        )
        from intel_extension_for_transformers_tpu.quantization import (
            RtnConfig,
            quantize_model,
        )

        config = LlamaConfig.tiny(vocab_size=259)
        params = llama_init_params(jax.random.PRNGKey(0), config)
        if args.qlora:
            params = quantize_model(
                params, RtnConfig(weight_dtype="nf4", group_size=32)
            ).params
        cfg.max_seq_length = 64
        lora, lora_cfg = ft.finetune(
            params=params,
            model_config=config,
            tokenizer=ByteTokenizer(),
            texts=["the quick brown fox jumps over the lazy dog. " * 10] * 8,
        )
    print(f"adapter (r={lora_cfg.r}) saved to {cfg.output_dir}")


if __name__ == "__main__":
    main()
