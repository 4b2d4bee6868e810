"""AWQ / TEQ: activation-aware per-channel scaling before RTN.

Re-derivation of the algorithms the reference routes to neural_compressor
(reference: AwqConfig utils/config.py:979, TeqConfig :1051; conversion at
llm/quantization/utils.py:555-687). AWQ searches a per-input-channel scale
s ∈ (act_magnitude)^α that minimizes quantization error of W·diag(s) given
the activation distribution; the inverse scale folds into the activations'
producer — here, since we quantize standalone (K, N) weights, we fold s into
the stored scales (mathematically identical for sym/asym RTN because groups
run along K and s is constant within a K row).

TEQ is the trainable version; v1 uses the same grid search (the reference's
trainable path needs a full training loop — tracked for a later round).
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.ops.packing import (
    QuantizedTensor,
    dequantize,
    quantize_groupwise,
)


def _quant_error(w_scaled, inv_s, x_mag, config) -> jax.Array:
    qt = quantize_groupwise(
        w_scaled,
        weight_dtype=config.weight_dtype,
        scheme=config.scheme,
        group_size=config.group_size,
    )
    deq = dequantize(qt) * inv_s[:, None]
    # error weighted by activation magnitude per input channel
    return jnp.sum((x_mag[:, None] * (deq - w_scaled * inv_s[:, None])) ** 2)


def awq_quantize(w: jax.Array, x_cal: jax.Array, config) -> QuantizedTensor:
    """Grid-search α over per-channel activation-magnitude scaling.

    w: (K, N); x_cal: (S, K) calibration activations feeding this linear.
    """
    w = w.astype(jnp.float32)
    K = w.shape[0]
    x = x_cal.astype(jnp.float32).reshape(-1, K)
    x_mag = jnp.mean(jnp.abs(x), axis=0)  # (K,)
    x_mag = jnp.where(x_mag == 0, 1e-8, x_mag)

    alphas = [0.0, 0.15, 0.3, 0.45, 0.6, 0.75, 0.9] if getattr(
        config, "auto_scale", True
    ) else [0.5]

    best = None
    for a in alphas:
        s = x_mag**a
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))  # normalize around 1
        s = jnp.clip(s, 1e-4, 1e4)
        w_scaled = w * s[:, None]
        err = _quant_error(w_scaled, 1.0 / s, x_mag, config)
        if best is None or float(err) < best[0]:
            best = (float(err), s)

    _, s = best
    w_scaled = w * s[:, None]
    qt = quantize_groupwise(
        w_scaled,
        weight_dtype=config.weight_dtype,
        scheme=config.scheme,
        group_size=config.group_size,
    )
    # The stored weight is W·diag(s) quantized; the true weight is
    # diag(1/s) @ stored, carried as an activation pre-scale (see
    # QuantizedTensor.pre_scale — woq_linear multiplies x by it, the
    # analogue of the reference folding scales into the preceding op).
    return replace(qt, pre_scale=(1.0 / s).astype(qt.scales.dtype))
