"""AWQ / TEQ: activation-aware per-channel scaling before RTN.

Re-derivation of the algorithms the reference routes to neural_compressor
(reference: AwqConfig utils/config.py:979, TeqConfig :1051; conversion at
llm/quantization/utils.py:555-687). AWQ searches a per-input-channel scale
s ∈ (act_magnitude)^α that minimizes quantization error of W·diag(s) given
the activation distribution; the inverse scale folds into the activations'
producer — here, since we quantize standalone (K, N) weights, we fold s into
the stored scales (mathematically identical for sym/asym RTN because groups
run along K and s is constant within a K row).

TEQ trains the per-channel scales directly (`teq_quantize`): a few hundred
optax steps minimize the calibration-weighted output error through a
straight-through estimator on the rounding — the JAX-native equivalent of
the reference's trainable-equivalent-transformation loop (TeqConfig,
utils/config.py:1051), seeded from the AWQ grid-search winner.
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


def _ste_fake_quant(w_scaled, config):
    """Differentiable group RTN: round() passes gradients straight through."""
    K, N = w_scaled.shape
    gs = config.group_size
    bits = 8 if config.weight_dtype == "int8" else 4
    qmax = 127.0 if bits == 8 else 7.0
    g = w_scaled.reshape(K // gs, gs, N)
    absmax = jax.lax.stop_gradient(jnp.max(jnp.abs(g), axis=1, keepdims=True))
    scale = jnp.where(absmax == 0, 1.0, absmax / qmax)
    normed = g / scale
    rounded = normed + jax.lax.stop_gradient(
        jnp.clip(jnp.round(normed), -qmax - 1, qmax) - normed
    )
    return (rounded * scale).reshape(K, N)


def teq_quantize(
    w: jax.Array,
    x_cal: jax.Array,
    config,
    *,
    steps: int = 200,
    lr: float = 1e-2,
) -> QuantizedTensor:
    """Trainable equivalent transformation: learn log-scales by SGD.

    Objective: || X · W − (X · diag(1/s)) · fakequant(diag(s) · W) ||² over
    the calibration batch — exactly the reconstruction TEQ trains in the
    reference (through INC), with the rounding made differentiable by STE.
    Initialized from the AWQ α-grid winner so training only has to refine.
    """
    import optax

    w = w.astype(jnp.float32)
    K = w.shape[0]
    x = x_cal.astype(jnp.float32).reshape(-1, K)
    y_ref = x @ w

    # init from the AWQ winner's scales
    awq_qt = awq_quantize(w, x_cal, config)
    s0 = 1.0 / awq_qt.pre_scale.astype(jnp.float32)
    log_s = jnp.log(jnp.clip(s0, 1e-4, 1e4))

    def loss_fn(log_s):
        s = jnp.exp(log_s)
        deq = _ste_fake_quant(w * s[:, None], config) / s[:, None]
        return jnp.mean((x @ deq - y_ref) ** 2)

    opt = optax.adam(lr)
    opt_state = opt.init(log_s)

    @jax.jit
    def step(log_s, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(log_s)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(log_s, updates), opt_state, loss

    best = (jnp.inf, log_s)
    for _ in range(steps):
        log_s, opt_state, loss = step(log_s, opt_state)
        if float(loss) < best[0]:
            best = (float(loss), log_s)

    s = jnp.exp(best[1])
    qt = quantize_groupwise(
        w * s[:, None],
        weight_dtype=config.weight_dtype,
        scheme=config.scheme,
        group_size=config.group_size,
    )
    return replace(qt, pre_scale=(1.0 / s).astype(qt.scales.dtype))
