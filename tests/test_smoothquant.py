"""W8A8 quantization tests: dynamic/static/SmoothQuant numerics, calibration
taps, model-level conversion, persistence (reference behavior:
convert_to_smoothquant_model llm/quantization/utils.py:745 + Nightly
test_smooth_quant.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.calibration import (
    collect_linear_inputs,
)
from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_apply,
    llama_apply_eager,
    llama_init_params,
)
from intel_extension_for_transformers_tpu.quantization import (
    DynamicQuantConfig,
    SmoothQuantConfig,
    StaticQuantConfig,
    W8A8Tensor,
    dequantize_w8a8,
    quantize_model,
    quantize_w8a8,
    sq_linear,
    sq_linear_ref,
)
from intel_extension_for_transformers_tpu.quantization.save_load import (
    load_low_bit,
    save_low_bit,
)
from intel_extension_for_transformers_tpu.quantization.quantize import (
    QuantizedParams,
)

CFG = LlamaConfig.tiny(vocab_size=64, max_position_embeddings=64)


def _rand_w(K=128, N=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(K, N)).astype(np.float32) * 0.1


def test_dynamic_w8a8_matches_ref():
    w = _rand_w()
    t = quantize_w8a8(w)
    assert t.act_scale is None and t.pre_scale is None
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 128)), jnp.float32)
    got = sq_linear(x, t)
    ref = sq_linear_ref(x, t)
    # int8 activation quantization error only
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel
    # and close to the true float matmul
    true = x @ jnp.asarray(w)
    rel2 = float(jnp.linalg.norm(got - true) / jnp.linalg.norm(true))
    assert rel2 < 0.03, rel2


def test_smoothquant_outlier_robustness():
    """With a strong per-channel activation outlier, smoothing should beat
    plain dynamic per-tensor weight quant."""
    rng = np.random.default_rng(0)
    w = _rand_w()
    x = rng.normal(size=(256, 128)).astype(np.float32)
    x[:, 7] *= 80.0  # classic SmoothQuant outlier channel
    plain = quantize_w8a8(w)
    smooth = quantize_w8a8(w, x_cal=x, alpha=0.5, static_act=True)
    assert smooth.pre_scale is not None and smooth.act_scale is not None
    xq = jnp.asarray(x[:32])
    true = xq @ jnp.asarray(w)

    def rel(t):
        got = sq_linear(xq, t)
        return float(jnp.linalg.norm(got - true) / jnp.linalg.norm(true))

    assert rel(smooth) < rel(plain) * 1.05  # smoothing never much worse
    assert rel(smooth) < 0.05


def test_dequantize_w8a8_consistency():
    w = _rand_w()
    x_cal = np.random.default_rng(2).normal(size=(64, 128)).astype(np.float32)
    t = quantize_w8a8(w, x_cal, alpha=0.5, static_act=True)
    deq = dequantize_w8a8(t)
    x = jnp.asarray(x_cal[:8])
    np.testing.assert_allclose(
        np.asarray(x @ deq), np.asarray(sq_linear_ref(x, t)), rtol=1e-4, atol=1e-4
    )


def test_calibration_taps():
    params = llama_init_params(jax.random.PRNGKey(0), CFG)
    batches = [
        {"input_ids": np.random.default_rng(i).integers(0, 64, (2, 16)).astype(np.int32)}
        for i in range(3)
    ]
    calib = collect_linear_inputs(
        params,
        lambda p, b: llama_apply_eager(p, CFG, jnp.asarray(b["input_ids"])),
        batches,
    )
    # every targeted linear got activations of the right width
    assert any("attention/q" in k for k in calib)
    for path, acts in calib.items():
        assert acts.ndim == 2 and acts.shape[0] > 0
    qk = next(k for k in calib if "attention/q" in k)
    assert calib[qk].shape[1] == CFG.hidden_size


def test_model_level_smoothquant_and_roundtrip(tmp_path):
    params = llama_init_params(jax.random.PRNGKey(0), CFG)
    batches = [
        {"input_ids": np.random.default_rng(i).integers(0, 64, (2, 16)).astype(np.int32)}
        for i in range(2)
    ]
    calib = collect_linear_inputs(
        params,
        lambda p, b: llama_apply_eager(p, CFG, jnp.asarray(b["input_ids"])),
        batches,
    )
    qp = quantize_model(params, SmoothQuantConfig(alpha=0.5), calib_inputs=calib)
    assert qp.quantized_paths
    leaf = qp.params["layers"][0]["attention"]["q"]["kernel"]
    assert isinstance(leaf, W8A8Tensor)

    ids = jnp.arange(12, dtype=jnp.int32)[None, :]
    ref, _ = llama_apply(params, CFG, ids)
    got, _ = llama_apply(qp.params, CFG, ids)
    rel = float(
        jnp.linalg.norm(got.astype(jnp.float32) - ref)
        / jnp.linalg.norm(ref.astype(jnp.float32))
    )
    assert rel < 0.1, rel

    d = str(tmp_path / "sq")
    save_low_bit(qp, d)
    r = load_low_bit(d)
    got2, _ = llama_apply(r.params, CFG, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(got2), atol=1e-5)


@pytest.mark.parametrize("config", [DynamicQuantConfig(), StaticQuantConfig()])
def test_model_level_int8_variants(config):
    params = llama_init_params(jax.random.PRNGKey(0), CFG)
    calib = None
    if isinstance(config, StaticQuantConfig):
        batches = [
            {"input_ids": np.arange(16, dtype=np.int32)[None, :] % 64}
        ]
        calib = collect_linear_inputs(
            params,
            lambda p, b: llama_apply_eager(p, CFG, jnp.asarray(b["input_ids"])),
            batches,
        )
    qp = quantize_model(params, config, calib_inputs=calib)
    ids = jnp.arange(12, dtype=jnp.int32)[None, :]
    ref, _ = llama_apply(params, CFG, ids)
    got, _ = llama_apply(qp.params, CFG, ids)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.12, (type(config).__name__, rel)
