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
from intel_extension_for_transformers_tpu.parallel.pipeline import (
    llama_pipeline_forward,
    llama_stage_params,
    pipeline_apply,
    split_stages,
    stack_layers,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "local_mesh",
    "named_sharding",
    "shard_params",
    "replicate",
    "logical_to_sharding",
    "pipeline_apply",
    "llama_pipeline_forward",
    "llama_stage_params",
    "split_stages",
    "stack_layers",
]
