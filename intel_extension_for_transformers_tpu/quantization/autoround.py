"""AutoRound: gradient-learned rounding offsets (SignRound family).

Re-derivation of the algorithm behind the reference's AutoRoundConfig
(reference: utils/config.py:1118; conversion via neural_compressor
AutoRoundQuantConfig at llm/quantization/utils.py:654-687). Learns a
per-weight rounding perturbation v ∈ [-0.5, 0.5] (and optional min/max scale
stretch) minimizing ||X W - X W_q||² on calibration activations, by signed
gradient descent — a few hundred cheap steps, all jit-compiled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.ops.packing import (
    QuantizedTensor,
    pack_int4,
)
from intel_extension_for_transformers_tpu.quantization.config import AutoRoundConfig


def autoround_quantize(
    w: jax.Array, x_cal: jax.Array, config: AutoRoundConfig
) -> QuantizedTensor:
    if config.weight_dtype not in ("int4", "int8") or config.scheme != "sym":
        from intel_extension_for_transformers_tpu.ops.packing import (
            quantize_groupwise,
        )

        return quantize_groupwise(
            w,
            weight_dtype=config.weight_dtype,
            scheme=config.scheme,
            group_size=config.group_size,
        )

    K, N = w.shape
    gs = config.group_size if config.group_size > 0 else K
    bits = 8 if config.weight_dtype == "int8" else 4
    qmax = 127.0 if bits == 8 else 7.0

    w = w.astype(jnp.float32)
    x = x_cal.astype(jnp.float32).reshape(-1, K)
    G = K // gs

    wg = w.reshape(G, gs, N)
    absmax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)
    scales = jnp.where(absmax == 0, 1.0, absmax / qmax)  # (G,1,N)

    y_ref = x @ w  # (S, N)

    def deq(v):
        q = jnp.clip(jnp.floor(wg / scales + 0.5 + v), -qmax - 1, qmax)
        return (q * scales).reshape(K, N)

    def loss(v):
        # straight-through: floor has no gradient; use the STE surrogate
        q_cont = wg / scales + v
        q_hard = jnp.clip(jnp.floor(q_cont + 0.5), -qmax - 1, qmax)
        q_ste = q_cont + jax.lax.stop_gradient(q_hard - q_cont)
        wq = (q_ste * scales).reshape(K, N)
        return jnp.mean((x @ wq - y_ref) ** 2)

    lr = config.lr if config.lr is not None else 1.0 / max(config.iters, 1)
    grad_fn = jax.grad(loss)

    def step(i, v):
        g = grad_fn(v)
        v = v - lr * jnp.sign(g)  # signed SGD per SignRound
        return jnp.clip(v, -0.5, 0.5)

    v0 = jnp.zeros_like(wg)
    v = jax.lax.fori_loop(0, config.iters, step, v0)

    q = jnp.clip(jnp.floor(wg / scales + 0.5 + v), -qmax - 1, qmax).astype(jnp.int8)
    q = q.reshape(K, N)
    data = pack_int4(q) if bits == 4 else q
    return QuantizedTensor(
        data=data,
        scales=scales[:, 0, :].astype(jnp.dtype(config.scale_dtype)),
        zeros=None,
        weight_dtype=config.weight_dtype,
        scheme="sym",
        group_size=gs,
        K=K,
        N=N,
    )
