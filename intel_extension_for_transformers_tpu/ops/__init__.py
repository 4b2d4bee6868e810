from intel_extension_for_transformers_tpu.ops.packing import (
    QuantizedTensor,
    quantize_groupwise,
    dequantize,
    pack_int4,
    unpack_int4,
)
from intel_extension_for_transformers_tpu.ops.quant_matmul import (
    woq_matmul,
    woq_matmul_ref,
    woq_linear,
)

__all__ = [
    "QuantizedTensor",
    "quantize_groupwise",
    "dequantize",
    "pack_int4",
    "unpack_int4",
    "woq_matmul",
    "woq_matmul_ref",
]
