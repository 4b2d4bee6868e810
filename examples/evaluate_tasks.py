"""LM evaluation: run the lm-eval-style task menu against a model.

Reference workflow: the vendored lm-eval harness
(reference: transformers/llm/evaluation/evaluator.py:632) driving
accuracy numbers for finetuned/quantized models.

    python examples/evaluate_tasks.py --model EleutherAI/gpt-j-6b \
        --tasks hellaswag arc_easy winogrande
    python examples/evaluate_tasks.py            # tiny random model, smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, help="HF causal LM to convert")
    p.add_argument("--tasks", nargs="+",
                   default=["hellaswag", "arc_easy", "boolq", "winogrande"])
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--data-path", action="append", default=[],
                   help="task=path overrides (JSONL in the raw schema)")
    args = p.parse_args()

    import jax

    from intel_extension_for_transformers_tpu.evaluation.tasks import (
        evaluate,
        list_tasks,
    )

    print("available tasks:", " ".join(list_tasks()))

    if args.model:
        import transformers

        from intel_extension_for_transformers_tpu.models.auto import (
            AutoModelForCausalLM,
        )

        m = AutoModelForCausalLM.from_pretrained(args.model)
        params, config = m.params, m.config
        tokenizer = transformers.AutoTokenizer.from_pretrained(args.model)
    else:  # offline smoke: tiny random model + byte tokenizer
        from intel_extension_for_transformers_tpu.models.llama import (
            LlamaConfig,
            llama_init_params,
        )
        from intel_extension_for_transformers_tpu.models.tokenization import (
            ByteTokenizer,
        )

        config = LlamaConfig.tiny(vocab_size=260)
        params = llama_init_params(jax.random.PRNGKey(0), config)
        tokenizer = ByteTokenizer()

    data_paths = dict(kv.split("=", 1) for kv in args.data_path)
    res = evaluate(
        params, config, tokenizer, args.tasks,
        batch_size=args.batch_size, data_paths=data_paths or None,
    )
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
