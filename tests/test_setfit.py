"""SetFit few-shot classification tests (reference: transformers/setfit/)."""

import numpy as np
import pytest

import jax

from intel_extension_for_transformers_tpu.models.bert import (
    BertConfig,
    bert_init_params,
)
from intel_extension_for_transformers_tpu.models.tokenization import ByteTokenizer
from intel_extension_for_transformers_tpu.setfit import SetFitModel, SetFitTrainer
from intel_extension_for_transformers_tpu.setfit.setfit import (
    SetFitTrainingArguments,
)

TRAIN = [
    ("the movie was wonderful and fun", "pos"),
    ("a delightful heartwarming film", "pos"),
    ("truly great acting and story", "pos"),
    ("absolutely loved every minute", "pos"),
    ("terrible boring waste of time", "neg"),
    ("awful film with bad acting", "neg"),
    ("dreadful and painfully slow", "neg"),
    ("i hated this disaster", "neg"),
]


@pytest.fixture(scope="module")
def model():
    config = BertConfig.tiny(vocab_size=259)
    params = bert_init_params(jax.random.PRNGKey(0), config)
    return SetFitModel(params, config, ByteTokenizer())


def test_setfit_train_and_predict(model):
    texts = [t for t, _ in TRAIN]
    labels = [l for _, l in TRAIN]
    trainer = SetFitTrainer(
        model,
        SetFitTrainingArguments(
            num_pairs=4, head_steps=100, batch_size=8, max_length=32
        ),
    )
    trained = trainer.train(texts, labels, label_names=["neg", "pos"])
    # must fit the training set (few-shot sanity)
    preds = trained.predict(texts)
    acc = np.mean([p == l for p, l in zip(preds, labels)])
    assert acc >= 0.75, (acc, preds)
    proba = trained.predict_proba(["wonderful wonderful film"])
    assert proba.shape == (1, 2)
    np.testing.assert_allclose(proba.sum(axis=-1), 1.0, atol=1e-5)


def test_setfit_encode_shape(model):
    emb = model.encode(["hello", "world longer text"], max_length=16)
    assert emb.shape[0] == 2
    # mean-pooled normalized embeddings
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb, np.float32), axis=-1), 1.0, atol=1e-3
    )
