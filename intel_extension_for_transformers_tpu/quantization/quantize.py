"""Model-level quantization: swap float linear weights for packed low-bit ones.

The TPU analogue of the reference's conversion pipeline
(reference: llm/quantization/utils.py:531 `convert_to_quantized_model` →
`replace_linear` :128/164, which swaps nn.Linear → QuantizedLinearQBits).
Here "replacing a module" is a pure pytree transformation: every eligible 2-D
float leaf in the params tree becomes a `QuantizedTensor`; model apply
functions call `woq_linear`, which dispatches on leaf type (float array →
jnp.dot, QuantizedTensor → Pallas kernel).

Algorithm dispatch:
- RTN       → direct group-wise round-to-nearest (pure JAX, no calibration)
- GPTQ      → per-layer Hessian-corrected rounding (quantization/gptq.py),
              needs calibration activations per layer
- AWQ/TEQ   → activation-aware per-channel scaling then RTN
              (quantization/awq.py), needs calibration activations
- AutoRound → gradient-learned rounding offsets (quantization/autoround.py)
- QAT       → params left float; fake-quant applied in the train step
"""

from __future__ import annotations

import dataclasses
import logging
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.ops.packing import (
    QuantizedTensor,
    dequantize,
    quantize_groupwise,
)
from intel_extension_for_transformers_tpu.quantization.config import (
    AwqConfig,
    AutoRoundConfig,
    DynamicQuantConfig,
    GPTQConfig,
    MixedPrecisionConfig,
    QuantizationConfigMixin,
    RtnConfig,
    SmoothQuantConfig,
    StaticQuantConfig,
    TeqConfig,
)

logger = logging.getLogger(__name__)

# Below this element count a weight stays float: packing overhead dominates
# and tiny layers (norms reshaped oddly, small heads) hurt accuracy.
MIN_QUANT_SIZE = 64 * 64


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def default_is_quantizable(path: str, leaf) -> bool:
    if not hasattr(leaf, "ndim") or leaf.ndim != 2:
        return False
    if leaf.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
        return False
    if leaf.size < MIN_QUANT_SIZE:
        return False
    # embedding tables are gathered, not matmul'd; skip by name
    # ("shared" = T5 tied embedding, "rel_bias" = relative-position table)
    if re.search(
        r"embed|embedding|position|pos_emb|token_type|shared|rel_bias",
        path,
        re.I,
    ):
        return False
    return True


@dataclass
class QuantizedParams:
    """Params pytree with packed weights + the config that produced it."""

    params: Any
    config: QuantizationConfigMixin
    quantized_paths: list = field(default_factory=list)


def _is_qt(x):
    from intel_extension_for_transformers_tpu.quantization.smoothquant import (
        W8A8Tensor,
    )

    return isinstance(x, (QuantizedTensor, W8A8Tensor))


def quantize_model(
    params: Any,
    config: QuantizationConfigMixin,
    *,
    is_quantizable: Optional[Callable[[str, Any], bool]] = None,
    calib_inputs: Optional[Mapping[str, jax.Array]] = None,
) -> QuantizedParams:
    """Quantize every eligible linear weight in `params` per `config`.

    `calib_inputs` maps param path → stacked calibration activations (S, K)
    for that linear layer; required by GPTQ/AWQ/TEQ (collected with
    models.calibration.collect_linear_inputs).
    """
    if isinstance(config, MixedPrecisionConfig):
        dtype = jnp.dtype(config.dtype)
        cast = jax.tree.map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            params,
        )
        return QuantizedParams(cast, config, [])

    is_quantizable = is_quantizable or default_is_quantizable
    skip = tuple(config.modules_to_not_convert or [])
    needs_calib = isinstance(
        config,
        (GPTQConfig, AwqConfig, TeqConfig, SmoothQuantConfig, StaticQuantConfig),
    )
    if needs_calib and not calib_inputs:
        logger.warning(
            "%s requires calibration activations (models.calibration."
            "collect_linear_inputs); falling back to calibration-free numerics",
            type(config).__name__,
        )

    quantized_paths = []

    def convert(path, leaf):
        p = _path_str(path)
        if any(s in p for s in skip):
            return leaf
        # MoE expert stacks: (E, K, N) leaves under .../experts/{gate,up,down}
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim == 3
            and "experts" in p
            and not isinstance(
                config, (SmoothQuantConfig, StaticQuantConfig, DynamicQuantConfig)
            )
            and config.weight_dtype in ("int4", "int8", "nf4", "fp4", "fp4_e2m1")
        ):
            from intel_extension_for_transformers_tpu.ops.packing import (
                quantize_groupwise_stacked,
            )

            K = leaf.shape[1]
            gs = config.group_size if config.group_size > 0 else K
            gs = min(gs, K)
            bad = K % gs != 0
            if config.weight_dtype != "int8":
                bad = bad or K % 2 != 0 or (K // 2) % gs != 0
            if bad:
                logger.info(
                    "skipping expert stack %s: K=%d vs group_size=%d", p, K, gs
                )
                return leaf
            quantized_paths.append(p)
            return quantize_groupwise_stacked(
                leaf.astype(jnp.float32),
                weight_dtype=config.weight_dtype,
                scheme=config.scheme,
                group_size=gs,
                scale_dtype=jnp.dtype(config.scale_dtype),
            )
        if not is_quantizable(p, leaf):
            return leaf
        w = leaf.astype(jnp.float32)
        if isinstance(
            config, (SmoothQuantConfig, StaticQuantConfig, DynamicQuantConfig)
        ):
            from intel_extension_for_transformers_tpu.quantization.smoothquant import (
                quantize_w8a8,
            )

            x_cal = calib_inputs.get(p) if calib_inputs else None
            alpha = config.alpha if isinstance(config, SmoothQuantConfig) else None
            static_act = (
                isinstance(config, (SmoothQuantConfig, StaticQuantConfig))
                and x_cal is not None
            )
            quantized_paths.append(p)
            return quantize_w8a8(
                w, x_cal, alpha if x_cal is not None else None, static_act
            )
        K = w.shape[0]
        gs = config.group_size if config.group_size > 0 else K
        if gs > K:
            gs = K
        bad = K % gs != 0
        if config.weight_dtype != "int8":
            bad = bad or K % 2 != 0 or (K // 2) % gs != 0
        if bad:
            logger.info("skipping %s: K=%d incompatible with group_size=%d", p, K, gs)
            return leaf
        x_cal = calib_inputs.get(p) if calib_inputs else None
        eff = (
            config
            if gs == config.group_size
            else dataclasses.replace(config, group_size=gs)
        )
        qt = _quantize_one(w, eff, x_cal)
        quantized_paths.append(p)
        return qt

    out = jax.tree_util.tree_map_with_path(convert, params)
    return QuantizedParams(out, config, quantized_paths)


def _quantize_one(
    w: jax.Array, config: QuantizationConfigMixin, x_cal: Optional[jax.Array]
) -> QuantizedTensor:
    scale_dtype = jnp.dtype(config.scale_dtype)
    kw = dict(
        weight_dtype=config.weight_dtype,
        scheme=config.scheme,
        group_size=config.group_size if config.group_size > 0 else w.shape[0],
        scale_dtype=scale_dtype,
    )
    if isinstance(config, GPTQConfig) and x_cal is not None:
        from intel_extension_for_transformers_tpu.quantization.gptq import (
            gptq_quantize,
        )

        return gptq_quantize(w, x_cal, config)
    if isinstance(config, TeqConfig) and x_cal is not None:
        from intel_extension_for_transformers_tpu.quantization.awq import teq_quantize

        return teq_quantize(
            w, x_cal, config,
            steps=getattr(config, "train_steps", 200),
            lr=getattr(config, "lr", 1e-2),
        )
    if isinstance(config, AwqConfig) and x_cal is not None:
        from intel_extension_for_transformers_tpu.quantization.awq import awq_quantize

        return awq_quantize(w, x_cal, config)
    if isinstance(config, AutoRoundConfig) and x_cal is not None:
        from intel_extension_for_transformers_tpu.quantization.autoround import (
            autoround_quantize,
        )

        return autoround_quantize(w, x_cal, config)
    return quantize_groupwise(w, **kw)


def dequantize_model(qparams: QuantizedParams, dtype=jnp.float32):
    """Reconstruct a float params tree (for debugging / parity tests)."""

    def deq(leaf):
        if isinstance(leaf, QuantizedTensor):
            if leaf.data.ndim == 3:  # stacked MoE expert tensor
                from intel_extension_for_transformers_tpu.ops.packing import (
                    dequantize_stacked,
                )

                return dequantize_stacked(leaf, dtype=dtype)
            return dequantize(leaf, dtype=dtype)
        if _is_qt(leaf):  # W8A8Tensor
            from intel_extension_for_transformers_tpu.quantization.smoothquant import (
                dequantize_w8a8,
            )

            return dequantize_w8a8(leaf, dtype=dtype)
        return leaf

    return jax.tree.map(deq, qparams.params, is_leaf=_is_qt)


# ---------------------------------------------------------------------------
# QAT fake-quant (straight-through estimator), used by the trainer
# (reference: QuantAwareTrainingConfig path through INC callbacks).
# ---------------------------------------------------------------------------


def fake_quant(w: jax.Array, bits: int = 4, group_size: int = 128) -> jax.Array:
    """Straight-through group-wise fake quantization for QAT train steps."""
    K = w.shape[0]
    if K % group_size:
        return w
    qmax = 7.0 if bits == 4 else 127.0
    g = w.reshape(K // group_size, group_size, -1)
    absmax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / qmax)
    q = jnp.clip(jnp.round(g / scale), -qmax - 1, qmax)
    deq = (q * scale).reshape(w.shape)
    return w + jax.lax.stop_gradient(deq - w)
