"""Compat mirror of the reference's transformers.utils surface
(reference: intel_extension_for_transformers/transformers/utils/__init__.py)."""

from intel_extension_for_transformers_tpu.transformers.utils import (  # noqa: F401
    metrics,
    objectives,
)
from intel_extension_for_transformers_tpu.transformers.utils.utility import (  # noqa: F401
    LazyImport,
)
