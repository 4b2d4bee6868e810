from intel_extension_for_transformers_tpu.setfit.setfit import (
    SetFitModel,
    SetFitTrainer,
)

__all__ = ["SetFitModel", "SetFitTrainer"]
