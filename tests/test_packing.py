"""Packing / group-quantization round-trip tests.

Models the reference's weight-only parity tests
(reference: tests/CI/test_weight_only.py:117 — int4 forward vs dequantized ref).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from intel_extension_for_transformers_tpu.ops import (
    quantize_groupwise,
    dequantize,
    pack_int4,
    unpack_int4,
)


def test_pack_unpack_roundtrip_signed():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(64, 128), dtype=np.int8)
    packed = pack_int4(jnp.asarray(q))
    assert packed.shape == (32, 128)
    out = np.asarray(unpack_int4(packed, signed=True))
    np.testing.assert_array_equal(out, q)


def test_pack_unpack_roundtrip_unsigned():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 16, size=(64, 128), dtype=np.int8)
    packed = pack_int4(jnp.asarray(q))
    out = np.asarray(unpack_int4(packed, signed=False))
    np.testing.assert_array_equal(out, q)


@pytest.mark.parametrize("weight_dtype", ["int4", "int8", "nf4", "fp4"])
@pytest.mark.parametrize("group_size", [32, 128])
def test_quantize_dequantize_error(weight_dtype, group_size):
    rng = np.random.default_rng(2)
    w = rng.normal(size=(512, 256)).astype(np.float32) * 0.05
    qt = quantize_groupwise(
        jnp.asarray(w), weight_dtype=weight_dtype, group_size=group_size
    )
    wd = np.asarray(dequantize(qt))
    assert wd.shape == w.shape
    # RTN error bounded by half a quantization step per group
    err = np.abs(wd - w)
    rel = err.mean() / np.abs(w).mean()
    bound = {"int4": 0.15, "int8": 0.01, "nf4": 0.13, "fp4": 0.25}[weight_dtype]
    assert rel < bound, f"mean rel err {rel}"


def test_quantize_asym_beats_sym_on_shifted_data():
    rng = np.random.default_rng(3)
    w = (rng.normal(size=(256, 128)) * 0.02 + 0.1).astype(np.float32)
    sym = quantize_groupwise(jnp.asarray(w), scheme="sym", group_size=64)
    asym = quantize_groupwise(jnp.asarray(w), scheme="asym", group_size=64)
    e_sym = np.abs(np.asarray(dequantize(sym)) - w).mean()
    e_asym = np.abs(np.asarray(dequantize(asym)) - w).mean()
    assert e_asym < e_sym


def test_quantize_group_must_divide():
    w = jnp.zeros((100, 128))
    with pytest.raises(ValueError):
        quantize_groupwise(w, group_size=64)


def test_quantized_tensor_nbytes_compression():
    w = jnp.asarray(np.random.default_rng(4).normal(size=(1024, 1024)), jnp.float32)
    qt = quantize_groupwise(w, weight_dtype="int4", group_size=128)
    # int4 + scales should be ~8x smaller than f32
    assert qt.nbytes < w.size * 4 / 7
