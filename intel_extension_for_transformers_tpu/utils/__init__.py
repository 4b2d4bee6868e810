from intel_extension_for_transformers_tpu.utils.device import (
    get_device_type,
    is_tpu_available,
    device_capabilities,
    supports_int4_matmul,
)
from intel_extension_for_transformers_tpu.utils.errorcode import ErrorCodes
from intel_extension_for_transformers_tpu.utils.error_utils import (
    set_latest_error,
    get_latest_error,
    clear_latest_error,
)

__all__ = [
    "get_device_type",
    "is_tpu_available",
    "device_capabilities",
    "supports_int4_matmul",
    "ErrorCodes",
    "set_latest_error",
    "get_latest_error",
    "clear_latest_error",
]
