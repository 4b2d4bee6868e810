from intel_extension_for_transformers_tpu.quantization.config import (
    QuantizationConfigMixin,
    MixedPrecisionConfig,
    RtnConfig,
    GPTQConfig,
    AwqConfig,
    TeqConfig,
    AutoRoundConfig,
    SmoothQuantConfig,
    StaticQuantConfig,
    DynamicQuantConfig,
    QuantAwareTrainingConfig,
    config_from_dict,
)
from intel_extension_for_transformers_tpu.quantization.quantize import (
    quantize_model,
    dequantize_model,
    QuantizedParams,
)
from intel_extension_for_transformers_tpu.quantization.save_load import (
    save_low_bit,
    load_low_bit,
)
from intel_extension_for_transformers_tpu.quantization.smoothquant import (
    W8A8Tensor,
    dequantize_w8a8,
    quantize_w8a8,
    sq_linear,
    sq_linear_ref,
)

__all__ = [
    "QuantizationConfigMixin",
    "MixedPrecisionConfig",
    "RtnConfig",
    "GPTQConfig",
    "AwqConfig",
    "TeqConfig",
    "AutoRoundConfig",
    "SmoothQuantConfig",
    "StaticQuantConfig",
    "DynamicQuantConfig",
    "QuantAwareTrainingConfig",
    "config_from_dict",
    "quantize_model",
    "dequantize_model",
    "QuantizedParams",
    "save_low_bit",
    "load_low_bit",
    "W8A8Tensor",
    "dequantize_w8a8",
    "quantize_w8a8",
    "sq_linear",
    "sq_linear_ref",
]
