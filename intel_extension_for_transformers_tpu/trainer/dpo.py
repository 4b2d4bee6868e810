"""Direct Preference Optimization trainer.

Re-derivation of the reference's DPO trainer (reference:
transformers/dpo_trainer.py:1-367 — policy/reference log-prob ratios on
chosen/rejected pairs, -logσ(β·Δ) loss) as a jitted functional loop. The
reference model's log-probs are computed in the SAME program with
stop_gradient — no second process or model copy on device when policy and
reference share the base (LoRA: reference = base without adapter).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from intel_extension_for_transformers_tpu.trainer.configs import DPOConfig

logger = logging.getLogger(__name__)


def sequence_logprob(logits: jax.Array, ids: jax.Array, mask: jax.Array) -> jax.Array:
    """Σ log p(token) over completion positions. mask (B,T): 1 = completion
    token (prompt and padding excluded). → (B,)"""
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tok = jnp.take_along_axis(lp, ids[:, 1:][..., None], axis=-1)[..., 0]
    return jnp.sum(tok * mask[:, 1:].astype(jnp.float32), axis=-1)


@dataclass
class DPOTrainOutput:
    params: Any
    training_loss: float
    log_history: list


class DPOTrainer:
    """Batches: dicts with chosen_input_ids/chosen_labels_mask and
    rejected_input_ids/rejected_labels_mask, each (B, T)."""

    def __init__(
        self,
        params: Any,
        apply_fn: Callable,  # (params, ids) -> logits
        config: Optional[DPOConfig] = None,
        ref_params: Any = None,  # None → frozen copy of params
        train_dataset=None,
    ):
        self.params = params
        self.apply_fn = apply_fn
        self.config = config or DPOConfig()
        self.ref_params = ref_params if ref_params is not None else params
        self.train_dataset = train_dataset
        self.log_history: list = []

    def train(self) -> DPOTrainOutput:
        cfg = self.config
        tx = optax.adamw(cfg.learning_rate)
        apply_fn, ref_params = self.apply_fn, self.ref_params

        def logps(params, batch):
            c = sequence_logprob(
                apply_fn(params, batch["chosen_input_ids"]),
                batch["chosen_input_ids"],
                batch["chosen_labels_mask"],
            )
            r = sequence_logprob(
                apply_fn(params, batch["rejected_input_ids"]),
                batch["rejected_input_ids"],
                batch["rejected_labels_mask"],
            )
            return c, r

        def loss_fn(params, batch):
            pc, pr = logps(params, batch)
            rc, rr = jax.tree.map(jax.lax.stop_gradient, logps(ref_params, batch))
            logits = cfg.beta * ((pc - rc) - (pr - rr))
            # sigmoid loss with optional label smoothing (reference dpo loss)
            loss = (
                -jax.nn.log_sigmoid(logits) * (1 - cfg.label_smoothing)
                - jax.nn.log_sigmoid(-logits) * cfg.label_smoothing
            )
            acc = jnp.mean((logits > 0).astype(jnp.float32))
            return jnp.mean(loss), acc

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, batch):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, acc

        # copy so donation never invalidates the caller's arrays
        params = jax.tree.map(jnp.copy, self.params)
        opt_state = tx.init(params)
        t0, loss_val = time.time(), float("nan")
        for gstep, batch in enumerate(self.train_dataset, 1):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, loss, acc = step(params, opt_state, batch)
            if gstep % cfg.logging_steps == 0 or gstep == 1:
                loss_val = float(loss)
                self.log_history.append(
                    {
                        "step": gstep,
                        "loss": loss_val,
                        "reward_acc": float(acc),
                        "time": time.time() - t0,
                    }
                )
                logger.info("dpo step %d loss %.4f acc %.2f", gstep, loss_val,
                            float(acc))
            if cfg.max_steps > 0 and gstep >= cfg.max_steps:
                break
        self.params = params
        return DPOTrainOutput(params, loss_val, self.log_history)
