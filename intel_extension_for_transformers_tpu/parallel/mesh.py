"""Device-mesh construction over ICI/DCN.

This is the TPU-native replacement for the reference's entire distributed
menu — DDP over oneCCL (reference: neural_chat/models/model_utils.py:293-311),
DeepSpeed AutoTP over HCCL (model_utils.py:249-291), and the engine's
shared-memory multi-instance weight sharing (executor/include/model.hpp:66-69).
One `jax.sharding.Mesh` with named axes subsumes all of them: `dp` for data
parallelism, `fsdp` for ZeRO-style parameter sharding, `tp` for tensor
parallelism, `sp` for sequence parallelism, `ep` for expert parallelism.
Collectives (`psum`, `all_gather`, `reduce_scatter`) are inserted by XLA from
sharding annotations and ride ICI within a slice, DCN across slices.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

import jax
from jax.sharding import Mesh

# Canonical axis order: collectives on the innermost (fastest-varying,
# physically-contiguous on ICI) axes are the cheapest, so tp/sp go innermost.
# pp (pipeline stages) sits outer — stage hops are one ppermute per
# microbatch, the coarsest traffic in the stack.
AXIS_ORDER = ("dp", "fsdp", "pp", "ep", "sp", "tp")


@dataclass(frozen=True)
class MeshConfig:
    """Logical parallelism degrees. -1 on at most one axis = fill remaining."""

    dp: int = 1
    fsdp: int = 1
    pp: int = 1
    ep: int = 1
    sp: int = 1
    tp: int = 1
    extras: dict = field(default_factory=dict)

    def resolved(self, n_devices: int) -> "MeshConfig":
        sizes = {a: getattr(self, a) for a in AXIS_ORDER}
        wild = [a for a, v in sizes.items() if v == -1]
        if len(wild) > 1:
            raise ValueError("at most one mesh axis may be -1")
        known = math.prod(v for v in sizes.values() if v != -1)
        if wild:
            if n_devices % known:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes product {known}"
                )
            sizes[wild[0]] = n_devices // known
        elif known != n_devices:
            raise ValueError(
                f"mesh axes product {known} != device count {n_devices}"
            )
        return MeshConfig(**{**sizes, "extras": self.extras})


def create_mesh(config: MeshConfig | None = None, devices=None, **axes) -> Mesh:
    """Create a named Mesh over all (or the given) devices.

    `create_mesh(dp=-1, tp=4)` → Mesh with dp filling the remainder.
    Axes of size 1 are kept (harmless, makes sharding rules uniform).
    """
    if config is None:
        config = MeshConfig(**axes) if axes else MeshConfig(dp=-1)
    devices = list(jax.devices()) if devices is None else list(devices)
    config = config.resolved(len(devices))
    shape = tuple(getattr(config, a) for a in AXIS_ORDER)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, AXIS_ORDER)


def local_mesh(**axes) -> Mesh:
    """Mesh over local devices only (single-host; tests and single-chip bench)."""
    return create_mesh(devices=jax.local_devices(), **axes)


def axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape.get(axis, 1)
