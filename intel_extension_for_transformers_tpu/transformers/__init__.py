"""Drop-in import-path compatibility with the reference package.

The reference's primary user-facing import is

    from intel_extension_for_transformers.transformers import (
        AutoModelForCausalLM, RtnConfig, ...)

(reference: intel_extension_for_transformers/transformers/__init__.py:19-49).
This subpackage mirrors that surface name-for-name so switching an existing
codebase is a package-name swap:

    from intel_extension_for_transformers_tpu.transformers import (
        AutoModelForCausalLM, RtnConfig, ...)

Every re-exported object is this framework's TPU-native implementation;
the handful of reference-only classes with no direct counterpart here
(BitsAndBytesConfig, PrunerV2, Metric/Objective) are provided as thin
adapters onto the native equivalents — see their docstrings.
"""

from intel_extension_for_transformers_tpu.models.auto import (
    AutoModel,
    AutoModelForCausalLM,
    AutoModelForSeq2SeqLM,
    OptimizedModel,
)
from intel_extension_for_transformers_tpu.models.length_adaptive import (
    DynamicLengthConfig,
)
from intel_extension_for_transformers_tpu.quantization.config import (
    AutoRoundConfig,
    AwqConfig,
    DynamicQuantConfig,
    GPTQConfig,
    MixedPrecisionConfig,
    QuantAwareTrainingConfig,
    RtnConfig,
    SmoothQuantConfig,
    StaticQuantConfig,
    TeqConfig,
)
from intel_extension_for_transformers_tpu.quantization.save_load import (
    WEIGHTS_NAME,
)
from intel_extension_for_transformers_tpu.trainer.configs import PruningConfig
from intel_extension_for_transformers_tpu.trainer.trainer import NLPTrainer
from intel_extension_for_transformers_tpu.utils.benchmark import BenchmarkConfig

from intel_extension_for_transformers_tpu.transformers.utils import (
    LazyImport,
    metrics,
    objectives,
)


class Provider:
    """Optimization provider tag (reference: transformers/config.py:33 —
    an Enum with the single member INC). Here the only provider is the
    native TPU stack; the symbol exists so reference code that writes
    `provider=Provider.INC.value` keeps running."""

    class _Member:
        def __init__(self, value):
            self.value = value

    INC = _Member("inc")
    TPU = _Member("tpu")


class BitsAndBytesConfig:
    """Compatibility constructor (reference re-exports transformers'
    BitsAndBytesConfig for the CPU/XPU load_in_4bit path,
    transformers/utils/__init__.py:30). There is no bitsandbytes on TPU;
    constructing one RETURNS the equivalent native weight-only config:
    load_in_4bit → RtnConfig(weight_dtype=bnb_4bit_quant_type), so it can be
    passed straight to `from_pretrained(quantization_config=...)`."""

    def __new__(cls, load_in_4bit: bool = False, load_in_8bit: bool = False,
                bnb_4bit_quant_type: str = "nf4",
                bnb_4bit_compute_dtype=None,
                bnb_4bit_use_double_quant: bool = False, **_ignored):
        if load_in_8bit:
            return RtnConfig(weight_dtype="int8", group_size=128)
        quant_type = {"nf4": "nf4", "fp4": "fp4"}.get(
            bnb_4bit_quant_type, "int4"
        )
        return RtnConfig(weight_dtype=quant_type, group_size=128)


class PrunerV2:
    """Compatibility constructor (reference: transformers/config.py:276 —
    the INC pruner config). Returns the native PruningConfig; unknown
    INC-specific knobs are accepted and dropped."""

    def __new__(cls, target_sparsity=None, pruning_type=None, pattern=None,
                op_names=None, excluded_op_names=None, start_step=None,
                end_step=None, pruning_scope=None, pruning_frequency=None,
                **_ignored):
        kw = {}
        if target_sparsity is not None:
            kw["target_sparsity"] = target_sparsity
        if pruning_type is not None:
            kw["pruning_type"] = pruning_type
        if start_step is not None:
            kw["start_step"] = start_step
        if end_step is not None:
            kw["end_step"] = end_step
        if pruning_frequency is not None:
            kw["update_frequency"] = pruning_frequency
        if excluded_op_names is not None:
            kw["excluded_names"] = list(excluded_op_names)
        return PruningConfig(**kw)


__all__ = [
    "WEIGHTS_NAME", "BenchmarkConfig", "DynamicLengthConfig", "Provider",
    "PrunerV2", "MixedPrecisionConfig", "BitsAndBytesConfig",
    "SmoothQuantConfig", "StaticQuantConfig", "DynamicQuantConfig",
    "QuantAwareTrainingConfig", "RtnConfig", "AwqConfig", "TeqConfig",
    "GPTQConfig", "AutoRoundConfig", "metrics", "objectives", "LazyImport",
    "AutoModelForCausalLM", "AutoModel", "AutoModelForSeq2SeqLM",
    "OptimizedModel", "NLPTrainer", "PruningConfig",
]
