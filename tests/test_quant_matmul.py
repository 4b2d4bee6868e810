"""Pallas WOQ matmul vs XLA reference parity (interpret mode on CPU).

Analogue of the reference's kernel-vs-ref gtest strategy
(reference: runtime/test/gtest/kernels/ — each kernel validated against its
*_ref implementation) and test_weight_only.py forward parity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intel_extension_for_transformers_tpu.ops import (
    quantize_groupwise,
    woq_matmul,
    woq_matmul_ref,
    woq_linear,
)


def _mk(M, K, N, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(M, K)).astype(np.float32) * 0.1
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    return jnp.asarray(x), jnp.asarray(w)


@pytest.mark.parametrize("weight_dtype", ["int4", "int8", "nf4", "fp4"])
@pytest.mark.parametrize("scheme", ["sym", "asym"])
def test_woq_matmul_matches_ref(weight_dtype, scheme):
    if weight_dtype in ("nf4", "fp4") and scheme == "asym":
        pytest.skip("codebook dtypes are symmetric")
    x, w = _mk(16, 512, 256)
    qt = quantize_groupwise(w, weight_dtype=weight_dtype, scheme=scheme, group_size=128)
    ref = woq_matmul_ref(x, qt)
    out = woq_matmul(x, qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_woq_matmul_close_to_fp32():
    x, w = _mk(8, 512, 256, seed=5)
    qt = quantize_groupwise(w, weight_dtype="int4", group_size=32)
    exact = np.asarray(x @ w)
    out = np.asarray(woq_matmul(x, qt))
    rel = np.abs(out - exact).mean() / np.abs(exact).mean()
    # int4 RTN noise on gaussian data: step ≈ absmax/7 ⇒ output SNR ≈ 10%
    assert rel < 0.15, f"int4 g32 matmul rel err {rel}"


def test_woq_matmul_batched_input():
    x, w = _mk(6, 256, 128, seed=6)
    x3 = x.reshape(2, 3, 256)
    qt = quantize_groupwise(w, group_size=128)
    out = woq_matmul(x3, qt)
    assert out.shape == (2, 3, 128)
    ref = woq_matmul_ref(x3, qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_woq_matmul_unaligned_m():
    # M=5 forces padding inside the kernel wrapper
    x, w = _mk(5, 256, 128, seed=7)
    qt = quantize_groupwise(w, group_size=64)
    out = woq_matmul(x, qt)
    ref = woq_matmul_ref(x, qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_woq_matmul_odd_n_falls_back():
    # N=96 not tileable by 128 → must still be correct via ref fallback
    x, w = _mk(4, 256, 96, seed=8)
    qt = quantize_groupwise(w, group_size=64)
    out = woq_matmul(x, qt)
    ref = woq_matmul_ref(x, qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_woq_linear_bias():
    x, w = _mk(4, 256, 128, seed=9)
    b = jnp.ones((128,), jnp.float32)
    qt = quantize_groupwise(w, group_size=128)
    out = woq_linear(x, qt, bias=b)
    ref = woq_matmul_ref(x, qt) + 1.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_woq_matmul_under_jit():
    x, w = _mk(8, 256, 128, seed=10)
    qt = quantize_groupwise(w, group_size=128)

    @jax.jit
    def f(x, qt):
        return woq_matmul(x, qt)

    out = f(x, qt)
    ref = woq_matmul_ref(x, qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_woq_matmul_grad_flows_to_x():
    # QLoRA-style: gradient w.r.t. activations through frozen quantized weight
    # (reference: autograd/functions.py:147 MatMulKBit.backward)
    x, w = _mk(4, 256, 128, seed=11)
    qt = quantize_groupwise(w, group_size=128)

    def loss(x):
        return jnp.sum(woq_matmul(x, qt) ** 2)

    gx = jax.grad(loss)(x)
    assert gx.shape == x.shape

    # finite-difference check on one coordinate
    eps = 1e-3
    dx = np.zeros(x.shape, np.float32)
    dx[0, 0] = eps
    l1 = loss(x + jnp.asarray(dx))
    l0 = loss(x - jnp.asarray(dx))
    fd = (l1 - l0) / (2 * eps)
    np.testing.assert_allclose(float(gx[0, 0]), float(fd), rtol=2e-2, atol=2e-2)


def test_woq_matmul_bf16_activations():
    x, w = _mk(8, 512, 256, seed=12)
    qt = quantize_groupwise(w, group_size=128)
    out = woq_matmul(x.astype(jnp.bfloat16), qt)
    assert out.dtype == jnp.bfloat16
    ref = np.asarray(woq_matmul_ref(x, qt, out_dtype=jnp.float32))
    rel = np.abs(np.asarray(out, np.float32) - ref).mean() / np.abs(ref).mean()
    assert rel < 0.03


# ----------------------- w32 decode layout (round 3) -----------------------


@pytest.mark.parametrize("scheme", ["sym", "asym"])
@pytest.mark.parametrize("g", [32, 64, 128])
def test_w32_layout_roundtrip_and_dequant(scheme, g):
    from intel_extension_for_transformers_tpu.ops.packing import (
        dequantize,
        from_decode_layout,
        quantize_groupwise,
        to_decode_layout,
    )

    _, w = _mk(1, 1024, 256, seed=11)
    qt = quantize_groupwise(w, weight_dtype="int4", scheme=scheme, group_size=g)
    qt32 = to_decode_layout(qt)
    assert qt32.layout == "w32" and qt32.data.dtype == jnp.int32
    back = from_decode_layout(qt32)
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(qt.data))
    np.testing.assert_array_equal(
        np.asarray(dequantize(qt32)), np.asarray(dequantize(qt))
    )


@pytest.mark.parametrize("M", [1, 5, 200])  # m1 path and the large-M path
@pytest.mark.parametrize("scheme", ["sym", "asym"])
def test_w32_matmul_matches_ref(M, scheme):
    """The bf16-bit-pattern decode kernel (offset-corrected in f32) matches
    the dequant-einsum oracle on both the scale-after-dot (small M) and
    scale-on-weight (large M) paths."""
    from intel_extension_for_transformers_tpu.ops.packing import (
        quantize_groupwise,
        to_decode_layout,
    )

    x, w = _mk(M, 1152, 300, seed=12)  # K pads 1152->1536, ragged N pads
    qt = quantize_groupwise(w, weight_dtype="int4", scheme=scheme, group_size=32)
    qt32 = to_decode_layout(qt)
    ref = woq_matmul_ref(x, qt)
    out = woq_matmul(x, qt32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_w32_grad_flows_to_x():
    from intel_extension_for_transformers_tpu.ops.packing import (
        quantize_groupwise,
        to_decode_layout,
    )

    x, w = _mk(4, 512, 128, seed=13)
    qt32 = to_decode_layout(quantize_groupwise(w, group_size=128))

    def f(x):
        return woq_matmul(x, qt32).sum()

    gx = jax.grad(f)(x)
    assert gx.shape == x.shape and bool(jnp.all(jnp.isfinite(gx)))


def test_large_m_compute_bound_path_parity():
    """M ≥ 1024 routes to the decode-once + XLA matmul path (encoder /
    prefill batches); parity with the f32 oracle must hold across dtypes
    and schemes like the Pallas path."""
    import jax

    from intel_extension_for_transformers_tpu.ops.packing import (
        quantize_groupwise,
    )
    from intel_extension_for_transformers_tpu.ops.quant_matmul import (
        woq_matmul,
        woq_matmul_ref,
    )

    K, N, M = 128, 96, 1200
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N))
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    for dt, scheme in [("int4", "sym"), ("int4", "asym"), ("int8", "sym"),
                       ("nf4", "sym")]:
        qt = quantize_groupwise(w, dt, scheme, 32)
        got = np.asarray(woq_matmul(x, qt), np.float32)
        ref = np.asarray(woq_matmul_ref(x, qt), np.float32)
        scale = np.abs(ref).max() + 1e-6
        assert np.abs(got - ref).max() / scale < 2e-2, (dt, scheme)
