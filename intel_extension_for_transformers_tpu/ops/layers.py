"""Shared NN building blocks (XLA-fused elementwise + attention).

Covers the reference executor's op set where XLA fusion is the right tool
(reference: executor/src/operators/ — layer_norm, rmsnorm, softmax, gelu,
multi_head_attention, position_ids, padding_sequence…). These are deliberately
plain jnp: XLA fuses elementwise chains into the surrounding matmuls on TPU,
so hand-written kernels would only add boundaries. Pallas is reserved for ops
XLA can't schedule well (quantized GEMM — quant_matmul.py; long-context
attention — flash_attention.py; the fused similarity+top-k lives with the
retrieval index, retrieval/index.py).

`dense` is the single linear-layer entry point: it dispatches on the weight
leaf type, so a model runs float or quantized depending only on its params
tree (the analogue of the reference swapping nn.Linear → QuantizedLinearQBits,
llm/quantization/utils.py:164).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from dataclasses import dataclass

from intel_extension_for_transformers_tpu.ops.packing import QuantizedTensor
from intel_extension_for_transformers_tpu.ops.quant_matmul import woq_linear


@dataclass
class LoraKernel:
    """Frozen base weight + trainable low-rank update W + s·(A@B).

    The functional analogue of the reference's QuantizedLoraLinearQBits
    (llm/quantization/nn/modules.py:395): base may be float or a packed
    QuantizedTensor (QLoRA). Gradients reach only `a`/`b` when the train
    loop differentiates w.r.t. the adapter tree."""

    base: object  # jax.Array (K, N) or QuantizedTensor
    a: jax.Array  # (K, r)
    b: jax.Array  # (r, N)
    scaling: float = 1.0


jax.tree_util.register_dataclass(
    LoraKernel, data_fields=["base", "a", "b"], meta_fields=["scaling"]
)


def dense(x: jax.Array, kernel, bias: Optional[jax.Array] = None) -> jax.Array:
    """x (..., K) @ kernel (K, N) + bias; kernel may be a QuantizedTensor
    or a LoraKernel (low-rank adapter over a frozen base)."""
    if isinstance(kernel, LoraKernel):
        y = dense(x, kernel.base, bias)
        # adapter path in f32: rank is tiny, cost is negligible, and QLoRA
        # numerics want the update un-rounded (reference: MatMulKBit +
        # QuantizedLoraLinearQBits, llm/quantization/nn/modules.py:395)
        xa = jnp.einsum("...k,kr->...r", x.astype(jnp.float32), kernel.a)
        return y + (kernel.scaling * jnp.einsum(
            "...r,rn->...n", xa, kernel.b
        )).astype(y.dtype)
    if isinstance(kernel, QuantizedTensor):
        return woq_linear(x, kernel, bias=bias)
    if type(kernel).__name__ == "W8A8Tensor":  # lazy to avoid import cycle
        from intel_extension_for_transformers_tpu.quantization.smoothquant import (
            sq_linear,
        )

        return sq_linear(x, kernel, bias=bias)
    if hasattr(kernel, "record") and hasattr(kernel, "base"):  # calibration tap
        kernel.record(x)
        return dense(x, kernel.base, bias)
    y = jnp.einsum(
        "...k,kn->...n", x, kernel.astype(x.dtype), preferred_element_type=x.dtype
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def layer_norm(x, scale, bias, eps: float = 1e-12):
    """LayerNorm with f32 statistics (reference: operators/layer_norm.cpp)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x, scale, eps: float = 1e-6):
    """RMSNorm (reference: operators/rmsnorm.cpp)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def gelu(x, approximate: bool = True):
    return jax.nn.gelu(x, approximate=approximate)


def silu(x):
    return jax.nn.silu(x)


def rope_inv_freq(head_dim: int, theta: float, scaling=None) -> jax.Array:
    """RoPE inverse frequencies with optional long-context scaling.

    `scaling` is a hashable tuple (lives inside static model configs):
    - ("linear", factor) — position interpolation: every frequency /factor
      (HF rope_scaling type "linear").
    - ("llama3", factor, low_freq_factor, high_freq_factor, orig_max) — the
    Llama-3.1 scheme (HF modeling_rope_utils `_compute_llama3_parameters`
    semantics, re-derived): wavelengths shorter than orig_max/high stay,
    longer than orig_max/low divide by factor, and the band between blends
    by the smoothing ramp.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if scaling is None:
        return inv_freq
    kind = scaling[0]
    if kind == "linear":
        return inv_freq / float(scaling[1])
    if kind == "llama3":
        factor, low_f, high_f, orig_max = (float(s) for s in scaling[1:5])
        wavelen = 2.0 * np.pi / inv_freq
        low_wl = orig_max / low_f
        high_wl = orig_max / high_f
        smooth = (orig_max / wavelen - low_f) / (high_f - low_f)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        blended = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        out = jnp.where(wavelen > low_wl, inv_freq / factor, blended)
        return jnp.where(wavelen < high_wl, inv_freq, out)
    raise ValueError(f"unsupported rope scaling {scaling!r}")


def rotary_embedding(
    positions: jax.Array, head_dim: int, theta: float = 10000.0, scaling=None
):
    """RoPE cos/sin tables for given positions (B, T) → (B, T, head_dim//2)."""
    inv_freq = rope_inv_freq(head_dim, theta, scaling)
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (B, T, D/2)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply RoPE to (B, T, H, D) given (B, T, D/2) tables."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


# Trace-time tap for H2O attention-mass statistics: when a jitted caller
# (models/engine.py h2o policy) sets `mass_tap` to a list before tracing a
# model apply, every attention() call appends its per-key attention mass
# (B, Tq, Tk) f32 summed over heads — the reference's heavy-hitter
# statistic (kv_cache_compression/prune/h2o.py:23 local_heavy_hitter_mask)
# collected without changing any model family's apply signature. Thread-local
# so concurrent traces in a threaded server never cross-pollinate.
import threading as _threading

_tap_tls = _threading.local()


def set_mass_tap(tap: Optional[list]) -> None:
    _tap_tls.mass_tap = tap


def get_mass_tap() -> Optional[list]:
    return getattr(_tap_tls, "mass_tap", None)


def attention(
    q: jax.Array,  # (B, Tq, H, D)
    k: jax.Array,  # (B, Tk, Hkv, D)
    v: jax.Array,  # (B, Tk, Hkv, D)
    mask: Optional[jax.Array] = None,  # broadcastable to (B, H, Tq, Tk); True=keep
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,  # additive logits bias (ALiBi etc.)
) -> jax.Array:
    """Multi-head attention with f32 softmax and GQA support
    (reference: executor/src/operators/multi_head_attention.cpp).

    XLA fuses QK^T → masked softmax → PV into tight MXU/VPU loops; for long
    sequences use ops.flash_attention (Pallas, O(T) memory, 2.4x at T=4096).
    """
    B, Tq, H, D = q.shape
    Hkv = k.shape[2]
    if Hkv != H:  # grouped-query: repeat kv heads
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = scale if scale is not None else 1.0 / (D**0.5)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    tap = get_mass_tap()
    if tap is not None:
        # per-batch-row key mass: the pooled serving engine decodes all
        # slots in one batched step, so H2O accumulation must stay per slot
        tap.append(jnp.sum(probs, axis=1))  # (B, Tq, Tk)
    probs = probs.astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=q.dtype)


def make_causal_mask(Tq: int, Tk: int, offset: int = 0) -> jax.Array:
    """(1, 1, Tq, Tk) boolean causal mask; offset = #cached tokens before q."""
    qi = jnp.arange(Tq)[:, None] + offset
    ki = jnp.arange(Tk)[None, :]
    return (ki <= qi)[None, None, :, :]


def padding_mask(attention_mask: jax.Array) -> jax.Array:
    """(B, Tk) int/bool → (B, 1, 1, Tk) boolean
    (reference: operators/padding_sequence.cpp)."""
    return attention_mask.astype(bool)[:, None, None, :]
