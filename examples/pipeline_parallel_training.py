"""Pipeline-parallel (GPipe) + data-parallel training on a device mesh.

Beyond the reference (SURVEY.md §2.3: PP absent in ITREX). The layer stack
splits into `pp` stages, microbatches stream through the schedule with one
ppermute hop per tick, and `jax.grad` differentiates straight through the
`lax.scan`-based schedule.

    # 8 virtual CPU devices (or real chips under TPU):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/pipeline_parallel_training.py --pp 4 --dp 2
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pp", type=int, default=4)
    p.add_argument("--dp", type=int, default=2)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--microbatches", type=int, default=2)
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize overrides the env var; win it back
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from intel_extension_for_transformers_tpu.models.llama import (
        LlamaConfig,
        llama_init_params,
    )
    from intel_extension_for_transformers_tpu.parallel import (
        create_mesh,
        llama_pipeline_forward,
        llama_stage_params,
    )

    mesh = create_mesh(dp=args.dp, pp=args.pp)
    config = LlamaConfig.tiny(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=args.layers,
    )
    params = llama_init_params(jax.random.PRNGKey(0), config)
    staged = llama_stage_params(params, config, mesh)  # layers → pp shards

    opt = optax.adamw(3e-3)
    opt_state = opt.init(staged)
    rng = np.random.default_rng(0)

    def loss_fn(staged, ids):
        logits = llama_pipeline_forward(
            params, staged, config, ids[:, :-1],
            mesh=mesh, num_microbatches=args.microbatches,
        )
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), ids[:, 1:]
            )
        )

    @jax.jit
    def step(staged, opt_state, ids):
        loss, grads = jax.value_and_grad(loss_fn)(staged, ids)
        updates, opt_state = opt.update(grads, opt_state, staged)
        return optax.apply_updates(staged, updates), opt_state, loss

    for i in range(args.steps):
        ids = jnp.asarray(rng.integers(0, 512, size=(8, 64)), jnp.int32)
        staged, opt_state, loss = step(staged, opt_state, ids)
        print(f"step {i}: loss {float(loss):.4f}  "
              f"(pp={args.pp} stages × dp={args.dp})")


if __name__ == "__main__":
    main()
