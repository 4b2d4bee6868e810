"""QLoRA finetune throughput — the reference's LoRA finetuning baseline.

Reference baseline (BASELINE.md / docs/release_data.md:300-312): Llama-7B
LoRA BF16 finetune on Alpaca (13k samples x 3 epochs, seq 512) takes 9.6 h
on one SPR node (2 h on 4 nodes with DDP/ccl). This measures the TPU-native
counterpart: QLoRA (int4 NF4-class packed base, rank-8 adapters on q/k/v/o)
with per-layer rematerialization, the whole optimization loop compiled as
one program (lax.fori_loop of train steps).

The packed base is generated directly from random bytes on device (identical
compute to a real checkpoint) and passed as an ARGUMENT to the jitted loop —
never a captured constant (the relay ships closure constants with the
compile request).

    python benchmarks/bench_qlora.py [--batch 4] [--seq 512] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_HOURS = 9.6  # 1 SPR node, Alpaca 13k x 3 epochs
ALPACA_SAMPLES = 13_000 * 3
ALPACA_SEQ = 512


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--steps", type=int, default=8,
                   help="train steps fused into the timed program")
    p.add_argument("--rank", type=int, default=8)
    p.add_argument("--tiny", action="store_true",
                   help="toy-geometry smoke run (CPU-friendly)")
    p.add_argument("--no-remat", action="store_true",
                   help="skip per-layer rematerialization (more activation "
                        "HBM, one less forward pass in the backward)")
    args = p.parse_args()

    if args.tiny:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=1"
        )

    import jax
    import jax.numpy as jnp
    import optax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benchmarks.bench_gptj_int4 import build_params
    from intel_extension_for_transformers_tpu.models.llama import (
        LlamaConfig,
        llama_apply,
    )
    from intel_extension_for_transformers_tpu.trainer.lora import (
        LoraConfig,
        attach_lora,
        lora_init,
    )
    from intel_extension_for_transformers_tpu.trainer.trainer import (
        causal_lm_loss,
    )

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        config = LlamaConfig(
            vocab_size=256, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            intermediate_size=128, max_position_embeddings=128,
        )
        args.batch, args.seq = 2, 32
    else:
        config = LlamaConfig.llama2_7b()
    import numpy as np

    t0 = time.time()
    gs = 32 if args.tiny else 128
    base = build_params(config, np.random.default_rng(0), group_size=gs)
    print(f"built int4 {'toy' if args.tiny else 'llama2-7b'} base "
          f"in {time.time()-t0:.0f}s", file=sys.stderr)

    lora_cfg = LoraConfig(r=args.rank)
    adapter = lora_init(jax.random.PRNGKey(0), base, lora_cfg)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(adapter)

    B, T, S = args.batch, args.seq, args.steps
    ids = jax.random.randint(
        jax.random.PRNGKey(1), (B, T), 0, config.vocab_size, jnp.int32
    )

    def loss_fn(adapter, base, ids):
        merged = attach_lora(base, adapter, lora_cfg.scaling)
        logits, _ = llama_apply(merged, config, ids,
                                remat=not args.no_remat)
        return causal_lm_loss(logits, ids)

    grad_fn = jax.value_and_grad(loss_fn)

    @jax.jit
    def run(adapter, opt_state, base, ids):
        def step(_, carry):
            adapter, opt_state, _ = carry
            loss, grads = grad_fn(adapter, base, ids)
            updates, opt_state = tx.update(grads, opt_state, adapter)
            adapter = optax.apply_updates(adapter, updates)
            return adapter, opt_state, loss

        return jax.lax.fori_loop(0, S, step, (adapter, opt_state, jnp.float32(0)))

    t0 = time.time()
    a1, o1, loss = run(adapter, opt_state, base, ids)
    float(loss)  # scalar readback — the only reliable sync through the relay
    print(f"compile+first {S} steps: {time.time()-t0:.0f}s "
          f"(loss {float(loss):.3f})", file=sys.stderr)

    t0 = time.time()
    _, _, loss = run(a1, o1, base, ids)
    float(loss)
    dt = time.time() - t0

    step_s = dt / S
    tok_s = B * T / step_s
    # the reference workload: 39k padded-512 Alpaca rows
    our_hours = ALPACA_SAMPLES * ALPACA_SEQ / tok_s / 3600
    print(json.dumps({
        "metric": "llama2_7b_qlora_finetune_throughput",
        "value": round(tok_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(REFERENCE_HOURS / our_hours, 2),
        "step_ms": round(step_s * 1e3, 1),
        "alpaca_13kx3_hours_1chip": round(our_hours, 2),
        "reference_hours_1node": REFERENCE_HOURS,
        "batch": B, "seq": T, "rank": args.rank,
    }))


if __name__ == "__main__":
    main()
