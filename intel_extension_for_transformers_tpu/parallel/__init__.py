from intel_extension_for_transformers_tpu.parallel.mesh import (
    MeshConfig,
    create_mesh,
    local_mesh,
)
from intel_extension_for_transformers_tpu.parallel.sharding import (
    named_sharding,
    shard_params,
    replicate,
    logical_to_sharding,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "local_mesh",
    "named_sharding",
    "shard_params",
    "replicate",
    "logical_to_sharding",
]
