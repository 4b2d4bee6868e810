"""SmoothQuant / static / dynamic W8A8 quantization.

Re-derivation of the reference's activation-quantization family
(reference: llm/quantization/utils.py:745 `convert_to_smoothquant_model`
via INC+ipex; configs utils/config.py:699-793 Dynamic/Static/SmoothQuant).

TPU-native formulation: an int8×int8 `lax.dot_general` with int32
accumulation runs on the MXU at double the bf16 rate — so W8A8 here is a
genuine compute-speed feature, not just memory compression. Three modes, one
`W8A8Tensor` leaf type dispatched by ops.layers.dense:

- dynamic:   act scale = per-row absmax computed in-program each call
- static:    act scale = per-tensor calibrated constant
- smoothquant: static + the α-balanced outlier smoothing s_j =
  max|X_j|^α / max|W_j|^(1-α); weights are pre-multiplied by s, activations
  divided by s via `pre_scale` (one fused VPU multiply before the matmul).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class W8A8Tensor:
    """Per-output-channel int8 weight + int8 activation quantization spec,
    logical weight shape (K, N)."""

    data: jax.Array  # (K, N) int8
    w_scale: jax.Array  # (N,) f32 — symmetric per-output-channel
    act_scale: Optional[jax.Array]  # scalar f32; None → dynamic per-row
    pre_scale: Optional[jax.Array]  # (K,) f32 smoothing (x ← x * pre_scale)
    K: int = 0  # static
    N: int = 0  # static

    @property
    def weight_dtype(self) -> str:
        return "int8"


jax.tree_util.register_dataclass(
    W8A8Tensor,
    data_fields=["data", "w_scale", "act_scale", "pre_scale"],
    meta_fields=["K", "N"],
)


def sq_linear(x: jax.Array, t: W8A8Tensor, bias=None) -> jax.Array:
    """x (..., K) → (..., N): quantize activations, int8 MXU matmul, rescale."""
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if t.pre_scale is not None:
        xf = xf * t.pre_scale
    if t.act_scale is None:
        # dynamic: per-row absmax (keeps batch outliers local to their row)
        s_act = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        s_act = jnp.maximum(s_act, 1e-8)
    else:
        s_act = t.act_scale
    q = jnp.clip(jnp.round(xf / s_act), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q,
        t.data,
        (((q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_act * t.w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def sq_linear_ref(x: jax.Array, t: W8A8Tensor, bias=None) -> jax.Array:
    """Float reference: dequantized weight einsum (parity oracle)."""
    w = t.data.astype(jnp.float32) * t.w_scale
    xf = x.astype(jnp.float32)
    if t.pre_scale is not None:
        xf = xf * t.pre_scale
    y = xf @ w
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _weight_int8(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """per-output-channel symmetric int8: → (data (K,N) int8, scale (N,))."""
    absmax = np.maximum(np.abs(w).max(axis=0), 1e-8)
    scale = (absmax / 127.0).astype(np.float32)
    data = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return data, scale


def quantize_w8a8(
    w: jax.Array,
    x_cal: Optional[np.ndarray] = None,
    alpha: Optional[float] = None,
    static_act: bool = False,
) -> W8A8Tensor:
    """One linear weight (K, N) → W8A8Tensor.

    alpha set → SmoothQuant smoothing from calibration stats.
    static_act → bake a per-tensor activation scale from calibration.
    """
    wf = np.asarray(w, np.float32)
    K, N = wf.shape
    pre_scale = None
    if alpha is not None and x_cal is not None:
        act_absmax = np.maximum(np.abs(x_cal).max(axis=0), 1e-5)  # (K,)
        w_absmax = np.maximum(np.abs(wf).max(axis=1), 1e-5)  # (K,)
        s = act_absmax**alpha / w_absmax ** (1.0 - alpha)
        s = np.clip(s, 1e-5, 1e5).astype(np.float32)
        wf = wf * s[:, None]
        pre_scale = (1.0 / s).astype(np.float32)
        if x_cal is not None:
            x_cal = x_cal * pre_scale
    data, w_scale = _weight_int8(wf)
    act_scale = None
    if static_act and x_cal is not None:
        act_scale = np.float32(max(np.abs(x_cal).max() / 127.0, 1e-8))
    return W8A8Tensor(
        data=jnp.asarray(data),
        w_scale=jnp.asarray(w_scale),
        act_scale=None if act_scale is None else jnp.asarray(act_scale),
        pre_scale=None if pre_scale is None else jnp.asarray(pre_scale),
        K=K,
        N=N,
    )


def dequantize_w8a8(t: W8A8Tensor, dtype=jnp.float32) -> jax.Array:
    """Effective float weight INCLUDING the smoothing fold (so
    x @ deq == sq_linear_ref(x, t) exactly)."""
    w = t.data.astype(jnp.float32) * t.w_scale
    if t.pre_scale is not None:
        w = t.pre_scale[:, None] * w
    return w.astype(dtype)
