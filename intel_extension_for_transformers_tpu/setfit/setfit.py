"""SetFit: few-shot sentence classification.

Re-creation of the reference's setfit integration
(reference: transformers/setfit/ — thin re-exports of the setfit library
with compression-trainer glue; the setfit recipe itself is: contrastive
finetuning of a sentence encoder on pseudo-pairs, then a logistic head).

TPU-native formulation: the encoder body stays FROZEN in HBM (optionally
int4/int8-quantized); the contrastive stage trains a LoRA adapter on it via
cosine-similarity loss over in-batch pairs (same jitted step machinery as
trainer/), and the classification head is a jitted softmax regression. This
keeps few-shot fitting to seconds while the heavy encode runs on the MXU.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax

from intel_extension_for_transformers_tpu.models.bert import (
    BertConfig,
    bert_encode,
)
from intel_extension_for_transformers_tpu.trainer.lora import (
    LoraConfig,
    attach_lora,
    lora_init,
)

logger = logging.getLogger(__name__)


@dataclass
class SetFitTrainingArguments:
    num_pairs: int = 8  # contrastive pairs generated per example
    contrastive_epochs: int = 1
    contrastive_lr: float = 1e-4
    head_steps: int = 200
    head_lr: float = 1e-2
    lora_r: int = 8
    batch_size: int = 16
    seed: int = 0
    max_length: int = 64


class SetFitModel:
    """Frozen (optionally quantized) encoder + LoRA adapter + linear head."""

    def __init__(self, encoder_params, config: BertConfig, tokenizer,
                 lora=None, lora_scaling: float = 1.0, head=None,
                 label_names: Optional[List[str]] = None):
        self.encoder_params = encoder_params
        self.config = config
        self.tokenizer = tokenizer
        self.lora = lora
        self.lora_scaling = lora_scaling
        self.head = head  # {"w": (D, C), "b": (C,)}
        self.label_names = label_names

    # ------------------------------------------------------------ encode
    def _params(self, lora=None):
        lora = lora if lora is not None else self.lora
        if lora is None:
            return self.encoder_params
        return attach_lora(self.encoder_params, lora, self.lora_scaling)

    def _tokenize(self, texts: Sequence[str], max_length: int):
        out = self.tokenizer(
            list(texts), padding=True, truncation=True, max_length=max_length
        )
        ids = np.asarray(out["input_ids"], np.int32)
        mask = np.asarray(out["attention_mask"], np.int32)
        return jnp.asarray(ids), jnp.asarray(mask)

    def encode(self, texts: Sequence[str], max_length: int = 64,
               lora=None) -> jax.Array:
        ids, mask = self._tokenize(texts, max_length)
        return bert_encode(
            self._params(lora), self.config, ids, mask, pooling="mean"
        )

    # ----------------------------------------------------------- predict
    def predict_proba(self, texts: Sequence[str]) -> np.ndarray:
        assert self.head is not None, "call SetFitTrainer.train first"
        emb = self.encode(texts)
        logits = emb @ self.head["w"] + self.head["b"]
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    def predict(self, texts: Sequence[str]) -> List:
        idx = np.argmax(self.predict_proba(texts), axis=-1)
        if self.label_names is not None:
            return [self.label_names[i] for i in idx]
        return list(idx)


class SetFitTrainer:
    def __init__(self, model: SetFitModel,
                 args: Optional[SetFitTrainingArguments] = None):
        self.model = model
        self.args = args or SetFitTrainingArguments()

    # -------------------------------------------------- contrastive stage
    def _make_pairs(self, labels: np.ndarray, rng: np.random.Generator):
        """→ (i, j, is_same) index triples, balanced pos/neg."""
        n = len(labels)
        by_label: dict = {}
        for i, l in enumerate(labels):
            by_label.setdefault(int(l), []).append(i)
        triples = []
        for i in range(n):
            li = int(labels[i])
            pos_pool = [j for j in by_label[li] if j != i]
            neg_pool = [j for j in range(n) if int(labels[j]) != li]
            for _ in range(self.args.num_pairs // 2):
                if pos_pool:
                    triples.append((i, int(rng.choice(pos_pool)), 1.0))
                if neg_pool:
                    triples.append((i, int(rng.choice(neg_pool)), 0.0))
        rng.shuffle(triples)
        return triples

    def train(self, texts: Sequence[str], labels: Sequence,
              label_names: Optional[List[str]] = None) -> SetFitModel:
        args = self.args
        model = self.model
        rng = np.random.default_rng(args.seed)
        uniq = sorted(set(labels))
        if label_names is None and not all(isinstance(l, int) for l in labels):
            label_names = [str(u) for u in uniq]
        lab_idx = np.asarray([uniq.index(l) for l in labels], np.int32)

        # 1) contrastive LoRA stage: cosine-similarity regression on pairs
        lcfg = LoraConfig(r=args.lora_r, target_modules=["query", "key",
                                                         "value", "output"])
        lora = lora_init(jax.random.PRNGKey(args.seed), model.encoder_params,
                         lcfg)
        model.lora_scaling = lcfg.scaling
        ids, mask = model._tokenize(texts, args.max_length)
        tx = optax.adam(args.contrastive_lr)
        opt_state = tx.init(lora)

        @jax.jit
        def step(lora, opt_state, ia, ib, target):
            def loss_fn(lora):
                p = attach_lora(model.encoder_params, lora, lcfg.scaling)
                emb = bert_encode(p, model.config, ids, mask, pooling="mean")
                ea, eb = emb[ia], emb[ib]
                cos = jnp.sum(ea * eb, axis=-1)
                return jnp.mean((cos - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(lora)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(lora, updates), opt_state, loss

        for _ in range(args.contrastive_epochs):
            triples = self._make_pairs(lab_idx, rng)
            for s in range(0, len(triples) - args.batch_size + 1,
                           args.batch_size):
                chunk = triples[s : s + args.batch_size]
                ia = jnp.asarray([t[0] for t in chunk], jnp.int32)
                ib = jnp.asarray([t[1] for t in chunk], jnp.int32)
                tgt = jnp.asarray([t[2] for t in chunk], jnp.float32)
                lora, opt_state, loss = step(lora, opt_state, ia, ib, tgt)
        model.lora = lora

        # 2) logistic-regression head on (adapter-tuned) embeddings
        emb = model.encode(texts, args.max_length)
        D, C = emb.shape[-1], len(uniq)
        head = {"w": jnp.zeros((D, C)), "b": jnp.zeros((C,))}
        htx = optax.adam(args.head_lr)
        hstate = htx.init(head)
        y = jnp.asarray(lab_idx)

        @jax.jit
        def hstep(head, hstate):
            def loss_fn(head):
                logits = emb @ head["w"] + head["b"]
                ll = jax.nn.log_softmax(logits, axis=-1)
                return -jnp.mean(jnp.take_along_axis(ll, y[:, None], 1))

            loss, grads = jax.value_and_grad(loss_fn)(head)
            updates, hstate = htx.update(grads, hstate)
            return optax.apply_updates(head, updates), hstate, loss

        for _ in range(args.head_steps):
            head, hstate, loss = hstep(head, hstate)
        model.head = head
        model.label_names = label_names
        logger.info("setfit trained: %d examples, %d classes, head loss %.4f",
                    len(texts), C, float(loss))
        return model
