"""Quantization config family.

Re-creation of the reference's serializable config classes
(reference: transformers/utils/config.py:59-1118 — ITREXQuantizationConfigMixin
and the Rtn/Gptq/Awq/Teq/AutoRound/SmoothQuant/Static/Dynamic/QAT configs),
with TPU-appropriate validation: weight dtypes map to the Pallas packed
formats in ops/packing.py, compute dtype defaults to bfloat16 (the MXU input
type), and device knobs are mesh-related instead of cpu/xpu.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional

from intel_extension_for_transformers_tpu.ops.packing import WEIGHT_DTYPES

QUANT_METHODS = {}


def _register(name):
    def deco(cls):
        cls.quant_method = name
        QUANT_METHODS[name] = cls
        return cls

    return deco


@dataclass
class QuantizationConfigMixin:
    """Base config (reference: utils/config.py:251 ITREXQuantizationConfigMixin)."""

    # dtype the dequantized matmuls compute in; bf16 feeds the MXU natively
    compute_dtype: Optional[str] = None
    weight_dtype: str = "int4"
    scale_dtype: str = "float32"
    group_size: int = 128
    scheme: str = "sym"
    # modules kept in high precision (reference: modules_to_not_convert /
    # llm_int8_skip_modules): matched by substring against the param path.
    modules_to_not_convert: list = field(default_factory=lambda: ["lm_head"])

    # class attribute (set by @_register), not a dataclass field — instances
    # would otherwise shadow the registered method name with the base default
    quant_method = "base"

    def post_init(self):
        if self.compute_dtype is None:
            self.compute_dtype = "bfloat16"
        if self.compute_dtype not in ("float32", "bfloat16", "float16"):
            raise ValueError(f"unsupported compute_dtype {self.compute_dtype}")
        wd = {"int4_fullrange": "int4", "int4_clip": "int4", "fp4_e2m1_bnb": "fp4"}.get(
            self.weight_dtype, self.weight_dtype
        )
        if wd not in WEIGHT_DTYPES:
            raise ValueError(
                f"unsupported weight_dtype {self.weight_dtype}; have {WEIGHT_DTYPES}"
            )
        self.weight_dtype = wd
        if self.scheme not in ("sym", "asym"):
            raise ValueError(f"scheme must be sym|asym, got {self.scheme}")
        if self.group_size <= 0:
            raise ValueError("group_size must be positive")
        return self

    # -- (de)serialization, mirrors config.py to_json_file/from_dict --
    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["quant_method"] = self.quant_method
        return d

    def to_json_string(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    def to_json_file(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json_string())

    @classmethod
    def from_dict(cls, d: dict) -> "QuantizationConfigMixin":
        d = dict(d)
        d.pop("quant_method", None)
        names = {f.name for f in dataclasses.fields(cls)}
        kept = {k: v for k, v in d.items() if k in names}
        obj = cls(**kept)
        obj.post_init()
        return obj

    @classmethod
    def from_json_file(cls, path: str) -> "QuantizationConfigMixin":
        with open(path) as f:
            return cls.from_dict(json.load(f))


def config_from_dict(d: dict) -> QuantizationConfigMixin:
    method = d.get("quant_method", "rtn")
    cls = QUANT_METHODS.get(method)
    if cls is None:
        raise ValueError(f"unknown quant_method {method!r}; have {sorted(QUANT_METHODS)}")
    return cls.from_dict(d)


@_register("rtn")
@dataclass
class RtnConfig(QuantizationConfigMixin):
    """Round-to-nearest WOQ (reference: utils/config.py:794)."""

    layer_wise: bool = False
    use_double_quant: bool = False
    double_quant_scale_dtype: str = "float32"

    def __post_init__(self):
        self.post_init()


@_register("gptq")
@dataclass
class GPTQConfig(QuantizationConfigMixin):
    """GPTQ second-order WOQ (reference: utils/config.py:865)."""

    damp_percent: float = 0.01
    blocksize: int = 128
    nsamples: int = 128
    max_input_length: Optional[int] = 2048
    desc_act: bool = False
    static_groups: bool = False
    true_sequential: bool = False
    tokenizer: Any = None

    def __post_init__(self):
        self.post_init()
        if not 0 < self.damp_percent < 1:
            raise ValueError("damp_percent must be in (0, 1)")


@_register("awq")
@dataclass
class AwqConfig(QuantizationConfigMixin):
    """Activation-aware WOQ (reference: utils/config.py:979)."""

    auto_scale: bool = True
    auto_clip: bool = True
    zero_point: bool = False
    nsamples: int = 128
    tokenizer: Any = None

    def __post_init__(self):
        if self.zero_point:
            self.scheme = "asym"
        self.post_init()


@_register("teq")
@dataclass
class TeqConfig(QuantizationConfigMixin):
    """Trainable-equivalent-transformation WOQ (reference: utils/config.py:1051)."""

    nsamples: int = 128
    train_steps: int = 100
    lr: float = 1e-3
    tokenizer: Any = None

    def __post_init__(self):
        self.post_init()


@_register("autoround")
@dataclass
class AutoRoundConfig(QuantizationConfigMixin):
    """SignRound-style learned rounding (reference: utils/config.py:1118)."""

    nsamples: int = 128
    iters: int = 200
    lr: Optional[float] = None
    minmax_lr: Optional[float] = None
    use_quant_input: bool = True
    tokenizer: Any = None

    def __post_init__(self):
        self.post_init()
        if self.lr is None:
            self.iters = max(self.iters, 1)
            self.lr = 1.0 / self.iters


@_register("smooth_quant")
@dataclass
class SmoothQuantConfig(QuantizationConfigMixin):
    """W8A8 with activation-outlier smoothing (reference: utils/config.py:749)."""

    alpha: float = 0.5
    nsamples: int = 100
    seq_len: int = 512
    auto_alpha_args: Optional[dict] = None
    shared_criterion: str = "max"
    tokenizer: Any = None

    def __post_init__(self):
        self.weight_dtype = "int8"
        self.act_dtype = "int8"
        self.post_init()
        if not 0 <= self.alpha <= 1:
            raise ValueError("alpha must be in [0, 1]")


@_register("static")
@dataclass
class StaticQuantConfig(QuantizationConfigMixin):
    """Static W8A8 with calibrated activation scales (reference: utils/config.py:713)."""

    nsamples: int = 100
    act_scheme: str = "sym"
    tokenizer: Any = None

    def __post_init__(self):
        self.weight_dtype = "int8"
        self.post_init()


@_register("dynamic")
@dataclass
class DynamicQuantConfig(QuantizationConfigMixin):
    """Dynamic W8A8: activation scales computed per batch on device
    (reference: utils/config.py:699)."""

    def __post_init__(self):
        self.weight_dtype = "int8"
        self.post_init()


@_register("qat")
@dataclass
class QuantAwareTrainingConfig(QuantizationConfigMixin):
    """QAT via straight-through fake-quant in the train step
    (reference: utils/config.py:663)."""

    def __post_init__(self):
        self.post_init()


@_register("mixed_precision")
@dataclass
class MixedPrecisionConfig:
    """bf16 mixed precision (reference: utils/config.py:59).

    On TPU this simply casts matmul-heavy params/activations to bfloat16 —
    the MXU native dtype — keeping layernorm/softmax accumulation in f32.
    """

    dtype: str = "bfloat16"
    quant_method: str = "mixed_precision"

    def __post_init__(self):
        if self.dtype not in ("bfloat16", "float16", "float32"):
            raise ValueError(f"unsupported mixed-precision dtype {self.dtype}")

    def to_dict(self):
        return {"dtype": self.dtype, "quant_method": self.quant_method}

    @classmethod
    def from_dict(cls, d):
        return cls(dtype=d.get("dtype", "bfloat16"))
