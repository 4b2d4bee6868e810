"""GPTQ: Hessian-corrected weight quantization, JAX-native.

Functional re-derivation of the GPTQ algorithm the reference delegates to
neural_compressor (reference: llm/quantization/utils.py:555-687, GPTQConfig at
utils/config.py:865). Implemented as blocked column-by-column error
compensation with a `lax.fori_loop`-friendly structure: the sequential
per-column update runs over columns of W^T blocks (the K dim of our (K, N)
layout), with the Cholesky-inverse Hessian trick from the GPTQ paper.

Note the layout: our weights are (K, N) = (in, out); GPTQ quantizes along K
(each output column n has its row w[:, n] quantized with error feedback
through H^{-1} where H = 2 X^T X from calibration activations X (S, K)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.ops.packing import (
    QuantizedTensor,
    pack_int4,
    quantize_groupwise,
)
from intel_extension_for_transformers_tpu.quantization.config import GPTQConfig


def _group_scales(w: jax.Array, group_size: int, scheme: str, qmax: float):
    """Per-group scale/zero over the K axis of a (K, N) weight."""
    K, N = w.shape
    g = w.reshape(K // group_size, group_size, N)
    if scheme == "sym":
        absmax = jnp.max(jnp.abs(g), axis=1)
        scales = jnp.where(absmax == 0, 1.0, absmax / qmax)
        zeros = jnp.zeros_like(scales)
    else:
        wmin = jnp.min(g, axis=1)
        wmax = jnp.max(g, axis=1)
        rng = wmax - wmin
        scales = jnp.where(rng == 0, 1.0, rng / qmax)
        zeros = jnp.round(-wmin / scales)
    return scales, zeros  # (G, N)


def gptq_quantize(
    w: jax.Array, x_cal: jax.Array, config: GPTQConfig
) -> QuantizedTensor:
    """Quantize (K, N) weight with Hessian feedback from x_cal (S, K)."""
    if config.weight_dtype not in ("int4", "int8", "int3", "int2"):
        # codebook dtypes: fall back to RTN packing after GPTQ would need
        # nearest-codebook rounding inside the loop; keep v1 scope tight.
        return quantize_groupwise(
            w,
            weight_dtype=config.weight_dtype,
            scheme=config.scheme,
            group_size=config.group_size,
        )

    K, N = w.shape
    gs = config.group_size if config.group_size > 0 else K
    bits = {"int8": 8, "int4": 4, "int3": 3, "int2": 2}[config.weight_dtype]
    # qmax follows packing.quantize_groupwise's level grids exactly, so the
    # packed tensor dequantizes identically to the RTN path's layout
    # (sub-4-bit rides the int4 nibble layout — tests/test_eval_gate.py)
    if config.scheme == "sym":
        qmax = {8: 127.0, 4: 7.0, 3: 3.0, 2: 1.0}[bits]
    else:
        qmax = {8: 255.0, 4: 15.0, 3: 7.0, 2: 3.0}[bits]
        if bits == 8:
            qmax = 127.0  # keep the historical int8-asym grid of this file

    w = w.astype(jnp.float32)
    x = x_cal.astype(jnp.float32).reshape(-1, K)

    # Hessian H = 2 X^T X / S + damping (reference GPTQ: damp_percent of mean diag)
    H = 2.0 * (x.T @ x) / x.shape[0]
    damp = config.damp_percent * jnp.mean(jnp.diag(H))
    H = H + jnp.eye(K, dtype=jnp.float32) * damp

    # Cholesky of H^{-1}: the GPTQ "inverse Hessian upper factor"
    Hinv = jnp.linalg.inv(H)
    # upper-triangular factor via Cholesky of Hinv
    L = jnp.linalg.cholesky(Hinv)  # lower
    U = L.T  # Hinv = L @ L.T; GPTQ uses chol(Hinv, upper=True) = U

    lo = -qmax - 1.0 if config.scheme == "sym" else 0.0
    hi = qmax
    is_asym = config.scheme == "asym"
    G = K // gs

    def group_scale(wg):
        """Scale/zero of one (gs, N) group — from the CURRENT (error-
        compensated) weights, derived as the sweep reaches the group
        (canonical GPTQ; the round-1 shortcut used pre-sweep weights)."""
        if is_asym:
            wmin = jnp.min(wg, axis=0)
            wmax = jnp.max(wg, axis=0)
            rng = wmax - wmin
            s = jnp.where(rng == 0, 1.0, rng / qmax)
            z = jnp.round(-wmin / s)
        else:
            absmax = jnp.max(jnp.abs(wg), axis=0)
            s = jnp.where(absmax == 0, 1.0, absmax / qmax)
            z = jnp.zeros_like(s)
        return s, z  # (N,), (N,)

    def row_body(r, carry):
        wcur, qacc, s, z, gi = carry
        k = gi * gs + r
        wk = jax.lax.dynamic_slice(wcur, (k, 0), (1, N))[0]  # (N,)
        q = jnp.clip(jnp.round(wk / s) + (z if is_asym else 0.0), lo, hi)
        deq = (q - (z if is_asym else 0.0)) * s
        ukk = jax.lax.dynamic_slice(U, (k, k), (1, 1))[0, 0]
        err = (wk - deq) / ukk
        # propagate error to remaining rows: w[j] -= U[k, j] * err for j > k
        row = jax.lax.dynamic_slice(U, (k, 0), (1, K))[0]  # (K,)
        mask = (jnp.arange(K) > k).astype(jnp.float32)
        wcur = wcur - (row * mask)[:, None] * err[None, :]
        qacc = jax.lax.dynamic_update_slice(qacc, q[None, :], (k, 0))
        return wcur, qacc, s, z, gi

    def group_body(gi, carry):
        wcur, qacc, sacc, zacc = carry
        wg = jax.lax.dynamic_slice(wcur, (gi * gs, 0), (gs, N))
        s, z = group_scale(wg)
        wcur, qacc, _, _, _ = jax.lax.fori_loop(
            0, gs, row_body, (wcur, qacc, s, z, gi)
        )
        sacc = jax.lax.dynamic_update_slice(sacc, s[None, :], (gi, 0))
        zacc = jax.lax.dynamic_update_slice(zacc, z[None, :], (gi, 0))
        return wcur, qacc, sacc, zacc

    qinit = jnp.zeros((K, N), jnp.float32)
    sinit = jnp.ones((G, N), jnp.float32)
    zinit = jnp.zeros((G, N), jnp.float32)
    _, qvals, scales, zeros = jax.lax.fori_loop(
        0, G, group_body, (w, qinit, sinit, zinit)
    )

    if bits in (4, 3, 2):  # sub-4-bit shares the int4 nibble layout
        if config.scheme == "sym":
            data = pack_int4(qvals.astype(jnp.int8))
        else:
            data = pack_int4(qvals.astype(jnp.uint8).astype(jnp.int8))
    else:
        if config.scheme == "sym":
            data = qvals.astype(jnp.int8)
        else:
            data = qvals.astype(jnp.uint8).astype(jnp.int8)

    return QuantizedTensor(
        data=data,
        scales=scales.astype(jnp.dtype(config.scale_dtype)),
        zeros=zeros.astype(jnp.dtype(config.scale_dtype))
        if config.scheme == "asym"
        else None,
        weight_dtype=config.weight_dtype,
        scheme=config.scheme,
        group_size=gs,
        K=K,
        N=N,
    )
