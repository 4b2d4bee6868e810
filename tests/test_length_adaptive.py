"""Length-adaptive inference tests (reference: transformers/dynamic/ —
drop-and-restore + evolutionary search; Nightly test_dynamic_length.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.bert import (
    BertConfig,
    bert_apply,
    bert_init_params,
)
from intel_extension_for_transformers_tpu.models.length_adaptive import (
    DynamicLengthConfig,
    bert_apply_length_adaptive,
    compute_cost,
    evolutionary_search,
    pareto_front,
    LengthConfigCandidate,
)

CFG = BertConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return bert_init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, (2, 32)).astype(np.int32)
    mask = np.ones((2, 32), np.int32)
    mask[1, 24:] = 0  # padding on the second row
    return jnp.asarray(ids), jnp.asarray(mask)


def test_full_length_matches_plain_bert(params, batch):
    """With no dropping, length-adaptive forward == plain forward."""
    ids, mask = batch
    full = (32,) * CFG.num_hidden_layers
    restored, kept, pos = bert_apply_length_adaptive(params, CFG, ids, mask, full)
    ref = bert_apply(params, CFG, ids, mask)
    np.testing.assert_allclose(
        np.asarray(restored), np.asarray(ref), rtol=2e-3, atol=2e-3
    )
    assert kept.shape == (2, 32, CFG.hidden_size)


def test_dropping_keeps_cls_and_shapes(params, batch):
    ids, mask = batch
    lens = (24, 16, 12, 8)
    restored, kept, pos = bert_apply_length_adaptive(params, CFG, ids, mask, lens)
    assert restored.shape == (2, 32, CFG.hidden_size)
    assert kept.shape == (2, 8, CFG.hidden_size)
    assert pos.shape == (2, 8)
    # CLS (position 0) always kept
    assert np.all(np.asarray(pos[:, 0]) == 0)
    # cost proxy
    assert compute_cost(lens, 32) == pytest.approx((24 + 16 + 12 + 8) / (4 * 32))


def test_cls_embedding_close_to_full(params, batch):
    """Mild dropping should barely move the CLS embedding (the length-
    adaptive accuracy premise)."""
    ids, mask = batch
    ref = bert_apply(params, CFG, ids, mask)[:, 0, :]
    restored, _, _ = bert_apply_length_adaptive(
        params, CFG, ids, mask, (32, 28, 24, 20)
    )
    cls = restored[:, 0, :]
    cos = np.sum(np.asarray(ref) * np.asarray(cls), axis=-1) / (
        np.linalg.norm(np.asarray(ref), axis=-1)
        * np.linalg.norm(np.asarray(cls), axis=-1)
    )
    assert np.all(cos > 0.98), cos


def test_dynamic_length_config_resolve():
    c = DynamicLengthConfig(const_rate=0.5)
    assert c.resolve(3, 32) == (16, 8, 4)
    c2 = DynamicLengthConfig(length_config=(10, 5))
    assert c2.resolve(2, 32) == (10, 5)


def test_evolutionary_search_finds_cheaper_configs(params, batch):
    ids, mask = batch
    ref = bert_apply(params, CFG, ids, mask)[:, 0, :]
    ref = np.asarray(ref) / np.linalg.norm(np.asarray(ref), axis=-1, keepdims=True)

    def eval_fn(lengths):
        restored, _, _ = bert_apply_length_adaptive(params, CFG, ids, mask, lengths)
        cls = np.asarray(restored[:, 0, :])
        cls = cls / np.linalg.norm(cls, axis=-1, keepdims=True)
        return float(np.mean(np.sum(ref * cls, axis=-1)))  # mean cosine

    front = evolutionary_search(
        eval_fn, CFG.num_hidden_layers, 32, population_size=6, generations=2
    )
    assert front
    # the front must contain a config cheaper than full compute w/ decent score
    assert any(c.cost < 1.0 and c.score > 0.9 for c in front), [
        (c.lengths, c.score, c.cost) for c in front
    ]


def test_pareto_front_logic():
    a = LengthConfigCandidate((4,), score=0.9, cost=0.5)
    b = LengthConfigCandidate((8,), score=0.95, cost=1.0)
    c = LengthConfigCandidate((6,), score=0.8, cost=0.9)  # dominated by a
    front = pareto_front([a, b, c])
    assert a in front and b in front and c not in front
