"""Device capability probes.

TPU-native analogue of the reference's CPU/XPU/HPU probes
(reference: intel_extension_for_transformers/tools/utils.py:29-96 —
`is_hpu_available`, `is_ipex_available`, `get_device_type`). Instead of ISA
checks (AMX/VNNI/AVX512, reference qbits/qbits.cpp:173-180) we report the JAX
backend, TPU generation, chip count, and memory-space sizes that gate kernel
choices (VMEM budget for Pallas tiling, HBM for index capacity).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any


@functools.lru_cache(maxsize=None)
def _backend() -> str:
    import jax

    return jax.default_backend()


def get_device_type() -> str:
    """Return 'tpu' | 'gpu' | 'cpu' for the default JAX backend."""
    b = _backend()
    if b in ("tpu", "axon"):
        return "tpu"
    return b


def is_tpu_available() -> bool:
    return get_device_type() == "tpu"


def supports_int4_matmul() -> bool:
    """Whether the Pallas int4 dequant-matmul fast path is usable.

    On TPU the MXU consumes bf16 operands, so int4 weights are dequantized in
    VMEM; this is supported everywhere. On CPU (tests) Pallas runs in
    interpreter mode, which is correct but slow — callers may prefer the
    XLA reference path there.
    """
    return True


# Rough per-core VMEM budgets by TPU generation; used to size Pallas tiles.
_VMEM_BYTES = {
    "v4": 16 * 1024 * 1024,
    "v5 lite": 16 * 1024 * 1024,
    "v5": 16 * 1024 * 1024,
    "v5p": 16 * 1024 * 1024,
    "v6": 32 * 1024 * 1024,
}


@dataclass(frozen=True)
class DeviceCapabilities:
    platform: str
    num_devices: int
    num_local_devices: int
    device_kind: str
    hbm_bytes_per_device: int
    vmem_bytes: int
    supports_bf16_matmul: bool
    extras: dict = field(default_factory=dict)


@functools.lru_cache(maxsize=None)
def device_capabilities() -> DeviceCapabilities:
    import jax

    devs = jax.devices()
    kind = devs[0].device_kind if devs else "cpu"
    hbm = 0
    try:
        stats: Any = devs[0].memory_stats()
        if stats:
            hbm = int(stats.get("bytes_limit", 0))
    except Exception:
        hbm = 0
    vmem = 16 * 1024 * 1024
    for key, v in _VMEM_BYTES.items():
        if key in kind.lower():
            vmem = v
    return DeviceCapabilities(
        platform=get_device_type(),
        num_devices=jax.device_count(),
        num_local_devices=jax.local_device_count(),
        device_kind=kind,
        hbm_bytes_per_device=hbm,
        vmem_bytes=vmem,
        supports_bf16_matmul=get_device_type() != "cpu",
    )


def use_pallas_interpret() -> bool:
    """Pallas TPU kernels must run in interpreter mode off-TPU (CI on CPU)."""
    return get_device_type() != "tpu"
