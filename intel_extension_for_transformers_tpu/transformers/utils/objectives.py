"""Tuning objective spec (reference: transformers/utils/objectives.py:19).

The native quantize path always optimizes the (performance, accuracy-gate)
pair, so objectives are descriptive here — accepted everywhere the
reference accepts them."""

from dataclasses import dataclass
from typing import Optional


@dataclass
class Objective:
    name: str
    greater_is_better: bool = True
    weight_ratio: Optional[float] = None

    @staticmethod
    def performance() -> "Objective":
        return Objective(name="performance", greater_is_better=True)

    @staticmethod
    def modelsize() -> "Objective":
        return Objective(name="modelsize", greater_is_better=False)


performance = Objective(name="performance", greater_is_better=True)
modelsize = Objective(name="modelsize", greater_is_better=False)
