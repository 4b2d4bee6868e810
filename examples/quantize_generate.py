"""Quantize a causal LM to INT4/INT8/NF4 and generate, with save/reload.

Reference workflow: AutoModelForCausalLM.from_pretrained(...,
quantization_config=RtnConfig()) → generate → save_low_bit → load_low_bit
(reference: modeling_auto.py + docs/weightonlyquant.md).

    python examples/quantize_generate.py --model facebook/opt-125m \
        --weight-dtype int4 --prompt "Once upon a time"
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, help="HF model name or low-bit dir")
    p.add_argument("--weight-dtype", default="int4",
                   choices=["int4", "int8", "nf4", "fp4"])
    p.add_argument("--group-size", type=int, default=128)
    p.add_argument("--prompt", default="Once upon a time")
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--save-dir", default=None, help="persist packed weights")
    args = p.parse_args()

    from intel_extension_for_transformers_tpu import (
        AutoModelForCausalLM,
        RtnConfig,
    )
    from intel_extension_for_transformers_tpu.models.generation import (
        SamplingConfig,
        detokenize_stream,
        generate_stream,
    )

    qcfg = RtnConfig(weight_dtype=args.weight_dtype, group_size=args.group_size)
    if args.model:
        model = AutoModelForCausalLM.from_pretrained(
            args.model, quantization_config=qcfg
        )
        ids = model.tokenizer(args.prompt, return_tensors="np")["input_ids"][0]
        eos = model.tokenizer.eos_token_id
        tok = model.tokenizer
    else:  # offline demo on a tiny random llama
        import jax

        from intel_extension_for_transformers_tpu.models.llama import (
            LlamaConfig,
            llama_init_params,
        )
        from intel_extension_for_transformers_tpu.models.tokenization import (
            ByteTokenizer,
        )
        from intel_extension_for_transformers_tpu.models.auto import TpuCausalLM
        from intel_extension_for_transformers_tpu.quantization import (
            quantize_model,
        )

        config = LlamaConfig.tiny(vocab_size=259)
        params = quantize_model(
            llama_init_params(jax.random.PRNGKey(0), config), qcfg
        ).params
        tok = ByteTokenizer()
        model = TpuCausalLM(params, config, tok, qcfg)
        ids = tok.encode(args.prompt)
        eos = None

    print(f"[{args.weight_dtype} g{args.group_size}] generating...")
    stream = generate_stream(
        model.params,
        model.config,
        ids,
        SamplingConfig(max_new_tokens=args.max_new_tokens, eos_token_id=eos),
    )
    for piece in detokenize_stream(stream, tok):
        print(piece, end="", flush=True)
    print()

    if args.save_dir:
        model.save_low_bit(args.save_dir)
        print(f"packed weights saved to {args.save_dir} "
              "(reload with AutoModelForCausalLM.from_pretrained)")


if __name__ == "__main__":
    main()
