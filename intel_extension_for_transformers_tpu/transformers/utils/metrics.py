"""Accuracy-gate metric spec (reference: transformers/utils/metrics.py:19).

`NLPTrainer.quantize(..., metric=Metric(...))` consumes `criterion` /
`is_relative` / `greater_is_better` for its accuracy gate; `name` and
`weight_ratio` are carried for API parity."""

from dataclasses import dataclass
from typing import Optional


@dataclass
class Metric:
    name: str
    greater_is_better: bool = True
    is_relative: bool = True
    criterion: float = 0.01
    weight_ratio: Optional[float] = None
