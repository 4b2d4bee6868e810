"""Compression-aware training workflow: distill + prune + QAT in one run.

Re-creation of the reference's workflows/compression_aware_training/ (its
config-driven src/run.py drives NLPTrainer.orchestrate_optimizations with
distillation/QAT/pruning combos). TPU version: one script over the same
`NLPTrainer.orchestrate_optimizations` surface — teacher distillation into a
smaller student while magnitude-pruning and fake-quant training it, then
real INT8/INT4 quantization and a quality report.

    python workflows/compression_aware_training.py            # tiny demo
    python workflows/compression_aware_training.py --steps 50 --sparsity 0.5
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--sparsity", type=float, default=0.5)
    p.add_argument("--weight-dtype", default="int4")
    p.add_argument("--seq-len", type=int, default=64)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.models.llama import (
        LlamaConfig,
        llama_apply,
        llama_init_params,
    )
    from intel_extension_for_transformers_tpu.quantization import (
        QuantAwareTrainingConfig,
    )
    from intel_extension_for_transformers_tpu.trainer import (
        DistillationConfig,
        NLPTrainer,
        PruningConfig,
        TrainingArguments,
    )

    # teacher: larger tiny llama; student: half width
    teacher_cfg = LlamaConfig.tiny(hidden_size=128, intermediate_size=256)
    student_cfg = LlamaConfig.tiny(hidden_size=64, intermediate_size=128)
    teacher = llama_init_params(jax.random.PRNGKey(0), teacher_cfg)
    student = llama_init_params(jax.random.PRNGKey(1), student_cfg)

    rng = np.random.default_rng(0)
    data = [
        {"input_ids": rng.integers(0, student_cfg.vocab_size, args.seq_len).astype(np.int32)}
        for _ in range(64)
    ]

    def teacher_apply(params, ids, mask=None):
        out, _ = llama_apply(params, teacher_cfg, ids, None, mask)
        return out

    trainer = NLPTrainer(
        student,
        student_cfg,
        args=TrainingArguments(
            max_steps=args.steps,
            per_device_train_batch_size=args.batch,
            learning_rate=5e-4,
        ),
        train_dataset=data,
    )
    # the reference's orchestrate_optimizations([distill, prune, quant])
    out = trainer.distill(
        DistillationConfig(temperature=2.0, alpha_ce=0.5),
        teacher_params=teacher,
        teacher_apply_fn=teacher_apply,
    )
    trainer.params = out.params
    out = trainer.prune(PruningConfig(target_sparsity=args.sparsity))
    trainer.params = out.params

    qmodel = trainer.quantize(
        QuantAwareTrainingConfig(weight_dtype=args.weight_dtype, group_size=32)
    )

    # report: sparsity achieved + loss trend + quantized size
    def sparsity(tree):
        leaves = [np.asarray(x) for x in jax.tree.leaves(tree) if hasattr(x, "size")]
        z = sum((np.abs(x) < 1e-8).sum() for x in leaves)
        n = sum(x.size for x in leaves)
        return float(z) / max(n, 1)

    from intel_extension_for_transformers_tpu.ops.packing import QuantizedTensor

    qbytes = sum(
        leaf.nbytes
        for leaf in jax.tree.leaves(
            qmodel.params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
        )
        if isinstance(leaf, QuantizedTensor)
    )
    report = {
        "workflow": "compression_aware_training",
        "steps": out.global_step,
        "final_loss": round(out.training_loss, 4),
        "student_sparsity": round(sparsity(out.params), 3),
        "quantized_linear_bytes": qbytes,
        "weight_dtype": args.weight_dtype,
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
