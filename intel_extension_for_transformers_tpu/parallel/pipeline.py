"""GPipe-style pipeline parallelism over the mesh `pp` axis.

Beyond the reference (SURVEY.md §2.3: PP is ABSENT in ITREX — its
parallelism menu stops at DDP/AutoTP/ZeRO). TPU-native formulation: the
decoder layer stack is split into S stages, each stage's layer slice lives
on one `pp` mesh slot (leaves sharded on their leading stage axis), and
activations hop stage→stage with ONE `ppermute` per tick while microbatches
stream through the classic GPipe schedule (M + S - 1 ticks, bubble at the
ends). Differentiable end to end: the tick loop is a `lax.scan`, so
reverse-mode AD replays the schedule backwards and the ppermute transposes
to the reverse ring — pipeline-parallel training falls out of `jax.grad`
with no hand-written backward schedule.

Embedding and LM head run OUTSIDE the pipeline (replicated or dp/tp-sharded
as usual): the rotating activation buffer must keep ONE static shape
(mb, T, H), and embed/head are a few percent of the FLOPs.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_layers(layers: list) -> dict:
    """List of per-layer param dicts (identical structure) → one pytree with
    a leading layer axis on every leaf."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def split_stages(stacked, num_stages: int):
    """Stacked layers (L, ...) → (S, L/S, ...) leading stage axis."""
    def f(x):
        L = x.shape[0]
        if L % num_stages:
            raise ValueError(f"{L} layers not divisible by {num_stages} stages")
        return x.reshape(num_stages, L // num_stages, *x.shape[1:])

    return jax.tree.map(f, stacked)


@partial(
    jax.jit,
    static_argnames=("stage_fn", "mesh", "axis", "num_microbatches",
                     "batch_axis"),
)
def pipeline_apply(
    stage_params,
    stage_fn: Callable,
    x: jax.Array,  # (M, mb, ...) microbatched activations
    *,
    mesh: Mesh,
    axis: str = "pp",
    num_microbatches: int = None,
    batch_axis: str = None,
):
    """Run x through all S pipeline stages → same-shape output.

    stage_params: pytree with leading stage axis S on every leaf (sharded
    over `axis`). stage_fn(stage_slice, x_mb) -> y_mb must preserve shape.
    batch_axis: mesh axis to shard the microbatch CONTENT dim (x dim 1)
    over — composes pp with dp so each dp replica pipelines only its batch
    slice (without it, dp replicas would all-gather and redundantly compute
    the full batch).
    """
    S = mesh.shape[axis]
    M = x.shape[0] if num_microbatches is None else num_microbatches

    def shard_fn(params_local, x_local):
        # leaves arrive as (1, L/S, ...) — drop the stage axis
        params_stage = jax.tree.map(lambda a: a[0], params_local)
        s = jax.lax.axis_index(axis)
        buf0 = jnp.zeros_like(x_local[0])
        outs0 = jnp.zeros_like(x_local)

        def tick(carry, t):
            buf, outs = carry
            x_t = jax.lax.dynamic_index_in_dim(
                x_local, jnp.clip(t, 0, M - 1), axis=0, keepdims=False
            )
            inp = jnp.where(s == 0, x_t, buf)
            y = stage_fn(params_stage, inp)
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            valid = (t >= S - 1) & (s == S - 1)
            prev = jax.lax.dynamic_index_in_dim(outs, out_idx, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, y, prev), out_idx, 0
            )
            perm = [(i, (i + 1) % S) for i in range(S)]
            buf = jax.lax.ppermute(y, axis, perm)
            return (buf, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (buf0, outs0), jnp.arange(M + S - 1)
        )
        # broadcast the last stage's buffer to every pp slot
        outs = jax.lax.psum(jnp.where(s == S - 1, outs, 0.0), axis)
        return outs

    # stage axis sharded over pp; microbatch contents replicated over pp,
    # optionally sharded over batch_axis (dp)
    pspec = jax.tree.map(lambda _: P(axis), stage_params)
    xspec = P(None, batch_axis, *([None] * (x.ndim - 2)))
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(pspec, xspec),
        out_specs=xspec,
        check_vma=False,
    )(stage_params, x)


# ---------------------- llama pipeline training forward ----------------------


def llama_stage_params(params: dict, config, mesh: Mesh, axis: str = "pp"):
    """Split params['layers'] into pp stages and device_put the stacked
    leaves with their stage axis sharded over `axis` → pipeline tree."""
    S = mesh.shape[axis]
    staged = split_stages(stack_layers(params["layers"]), S)
    spec = jax.tree.map(lambda _: NamedSharding(mesh, P(axis)), staged)
    return jax.device_put(staged, spec)


@partial(
    jax.jit,
    static_argnames=("config", "mesh", "axis", "num_microbatches",
                     "batch_axis"),
)
def llama_pipeline_forward(
    params: dict,  # full tree; layers are IGNORED in favor of staged_layers
    staged_layers,  # from llama_stage_params
    config,
    input_ids: jax.Array,  # (B, T)
    *,
    mesh: Mesh,
    axis: str = "pp",
    num_microbatches: int = 4,
    batch_axis: str = "auto",  # "auto": dp when present and it divides mb
):
    """Training/scoring forward with the layer stack pipelined over `pp`
    → logits (B, T, V). Exact vs llama_apply (tests pin this)."""
    from intel_extension_for_transformers_tpu.models.llama import (
        _decoder_layer,
    )
    from intel_extension_for_transformers_tpu.ops.layers import (
        dense,
        rms_norm,
        rotary_embedding,
    )

    B, T = input_ids.shape
    M = num_microbatches
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mb = B // M
    if batch_axis == "auto":
        dp = mesh.shape.get("dp", 1)
        batch_axis = "dp" if dp > 1 and mb % dp == 0 else None

    x = jnp.take(params["embed_tokens"], input_ids, axis=0)
    # batch-1 rotary tables: they broadcast over any (local) microbatch size
    # inside the shard_map, where mb may be dp-sharded
    cos, sin = rotary_embedding(
        jnp.arange(T)[None, :], config.head_dim, config.rope_theta,
        getattr(config, "rope_scaling", None),
    )
    qi = jnp.arange(T)[:, None]
    ki = jnp.arange(T)[None, :]
    mask = (ki <= qi)[None, None, :, :]

    def stage_fn(stage_layers, h):
        def body(carry, layer):
            out, _, _, _, _ = _decoder_layer(
                layer, carry, config, cos, sin, mask, None, None, jnp.int32(0)
            )
            return out, None

        h, _ = jax.lax.scan(body, h, stage_layers)
        return h

    x = pipeline_apply(
        staged_layers, stage_fn, x.reshape(M, mb, T, -1),
        mesh=mesh, axis=axis, num_microbatches=M, batch_axis=batch_axis,
    )
    x = x.reshape(B, T, -1)
    x = rms_norm(x, params["final_norm"], config.rms_norm_eps)
    return dense(x, params["lm_head"]["kernel"])
