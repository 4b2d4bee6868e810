"""Sharding rules: logical axis names → mesh axes → NamedSharding.

Replaces the reference's per-architecture DeepSpeed injection policies
(reference: neural_chat/models/model_utils.py:173 `get_ds_injection_policy`)
with a declarative rule table. Model code tags each parameter with logical
axis names (e.g. ("embed", "mlp")); a rule map assigns logical names to mesh
axes; XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Default logical→mesh rules (Megatron-style TP + optional FSDP):
#   embed      — hidden/model dim; sharded over fsdp when in the "stacked" pos
#   heads      — attention-head dim → tp
#   mlp        — MLP intermediate dim → tp
#   kv         — kv-head dim → tp
#   vocab      — vocabulary dim → tp (output embedding column-parallel)
#   batch      — data batch → dp (+fsdp when both shard data)
#   length     — sequence dim → sp
#   expert     — MoE expert dim → ep
DEFAULT_RULES: dict[str, Any] = {
    "batch": ("dp", "fsdp"),
    "length": "sp",
    "embed": None,
    "embed_fsdp": "fsdp",
    "heads": "tp",
    "kv": "tp",
    "mlp": "tp",
    "vocab": "tp",
    "expert": "ep",
    "qkv": "tp",
    "norm": None,
    "group": None,  # quantization-group dim: follows its weight's K dim
}


def logical_to_sharding(
    logical_axes: Sequence[str | None],
    mesh: Mesh,
    rules: Mapping[str, Any] | None = None,
) -> NamedSharding:
    rules = {**DEFAULT_RULES, **(rules or {})}
    spec = []
    used: set[str] = set()
    for name in logical_axes:
        if name is None:
            spec.append(None)
            continue
        mesh_axes = rules.get(name)
        if mesh_axes is None:
            spec.append(None)
            continue
        if isinstance(mesh_axes, str):
            mesh_axes = (mesh_axes,)
        # Drop axes already consumed by an earlier dim or missing from mesh.
        keep = tuple(
            a for a in mesh_axes if a in mesh.shape and a not in used and mesh.shape[a] > 1
        )
        used.update(keep)
        if not keep:
            spec.append(None)
        elif len(keep) == 1:
            spec.append(keep[0])
        else:
            spec.append(keep)
    return NamedSharding(mesh, P(*spec))


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, param_axes, mesh: Mesh, rules=None):
    """Device-put a param pytree according to a matching pytree of logical axes.

    `param_axes` mirrors `params`; leaves are tuples of logical axis names (or
    None for replicated). Equivalent role to ZeRO-3 partitioning + AutoTP in
    the reference, done once at load time.
    """

    def _place(p, axes):
        if _is_packed(p):
            return _shard_packed(p, axes, mesh, rules)
        if axes is None:
            return jax.device_put(p, replicate(mesh))
        return jax.device_put(p, logical_to_sharding(axes, mesh, rules))

    return jax.tree.map(
        _place,
        params,
        param_axes,
        is_leaf=lambda x: x is None or _is_packed(x),
    )


def _is_packed(x) -> bool:
    return type(x).__name__ in ("QuantizedTensor", "W8A8Tensor")


def _shard_packed(qt, axes, mesh: Mesh, rules):
    """Shard a packed quantized weight: the output (N) dim follows the
    kernel's second logical axis; the K dim stays replicated (int4 packing
    and scale groups straddle K, so K-sharding would split groups). scales/
    zeros/w_scale follow N; pre_scale/act_scale replicate."""
    import dataclasses

    n_axis = axes[1] if axes is not None and len(axes) > 1 else None
    two_d = logical_to_sharding((None, n_axis), mesh, rules)
    one_d_n = logical_to_sharding((n_axis,), mesh, rules)
    rep = replicate(mesh)

    def put(v, sh):
        return None if v is None else jax.device_put(v, sh)

    fields = {}
    for f in dataclasses.fields(qt):
        fields[f.name] = getattr(qt, f.name)
    fields["data"] = put(fields["data"], two_d)
    if "scales" in fields:  # QuantizedTensor
        fields["scales"] = put(fields["scales"], two_d)
        fields["zeros"] = put(fields["zeros"], two_d)
        fields["pre_scale"] = put(fields["pre_scale"], rep)
    else:  # W8A8Tensor
        fields["w_scale"] = put(fields["w_scale"], one_d_n)
        fields["act_scale"] = put(fields["act_scale"], rep)
        fields["pre_scale"] = put(fields["pre_scale"], rep)
    return type(qt)(**fields)
