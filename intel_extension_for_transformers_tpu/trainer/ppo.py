"""PPO trainer with a value head (RLHF).

Re-derivation of the reference's PPO stack
(reference: transformers/ppo_trainer.py:1-1848 + ppo_core.py + the
value-head model trl_models/modeling_value_head.py — trl-style API where
`step(queries, responses, rewards)` consumes externally-generated rollouts).

TPU-native design: logprobs, values, per-token KL vs the frozen reference
policy, GAE advantages, and the clipped surrogate + value loss all happen in
ONE jitted program per minibatch; the reference policy needs no second model
copy when policy == LoRA-over-ref (pass ref_params = base params). The value
head is a (H, 1) linear over the final-norm hidden states
(models/llama.py llama_apply_with_hidden).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

logger = logging.getLogger(__name__)


@dataclass
class PPOConfig:
    """(reference: ppo_config.py)"""

    learning_rate: float = 1e-5
    ppo_epochs: int = 4
    cliprange: float = 0.2
    cliprange_value: float = 0.2
    vf_coef: float = 0.1
    init_kl_coef: float = 0.1  # per-token KL penalty folded into rewards
    gamma: float = 1.0
    lam: float = 0.95
    max_grad_norm: float = 1.0
    seed: int = 0


def value_head_init(rng: jax.Array, hidden_size: int) -> dict:
    return {
        "kernel": jax.random.normal(rng, (hidden_size, 1)) * (hidden_size**-0.5),
        "bias": jnp.zeros((1,)),
    }


@dataclass
class PPOStepStats:
    loss: float
    policy_loss: float
    value_loss: float
    mean_kl: float
    mean_reward: float


class PPOTrainer:
    """step(query_ids, response_ids, rewards) — rollouts are generated
    externally (models.generation), mirroring trl's PPOTrainer.step."""

    def __init__(
        self,
        params: Any,
        model_config: Any,
        config: Optional[PPOConfig] = None,
        ref_params: Any = None,
        value_params: Optional[dict] = None,
        apply_with_hidden: Optional[Callable] = None,
    ):
        self.config = config or PPOConfig()
        self.model_config = model_config
        if apply_with_hidden is None:
            from intel_extension_for_transformers_tpu.models.llama import (
                llama_apply_with_hidden,
            )

            def apply_with_hidden(p, ids):
                return llama_apply_with_hidden(p, model_config, ids)

        self.apply_with_hidden = apply_with_hidden
        # copy: the train step donates its buffers
        self.params = jax.tree.map(jnp.copy, params)
        self.ref_params = ref_params if ref_params is not None else params
        self.value_params = value_params or value_head_init(
            jax.random.PRNGKey(self.config.seed), model_config.hidden_size
        )
        self._tx = optax.chain(
            optax.clip_by_global_norm(self.config.max_grad_norm),
            optax.adam(self.config.learning_rate),
        )
        self._opt_state = self._tx.init((self.params, self.value_params))
        self.log_history: List[dict] = []

    # ------------------------------------------------------------- core
    def _forward(self, params, value_params, ids):
        logits, hidden = self.apply_with_hidden(params, ids)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(lp, ids[:, 1:][..., None], axis=-1)[..., 0]
        values = (
            hidden[:, :-1].astype(jnp.float32) @ value_params["kernel"]
            + value_params["bias"]
        )[..., 0]
        return tok_lp, values  # both (B, T-1), aligned to predicting ids[:,1:]

    def step(
        self,
        query_ids: np.ndarray,  # (B, Tq) prompt tokens
        response_ids: np.ndarray,  # (B, Tr) generated tokens
        rewards: np.ndarray,  # (B,) scalar sequence rewards
    ) -> PPOStepStats:
        cfg = self.config
        ids = jnp.asarray(
            np.concatenate([np.asarray(query_ids), np.asarray(response_ids)], 1),
            jnp.int32,
        )
        Tq = np.asarray(query_ids).shape[1]
        rewards = jnp.asarray(rewards, jnp.float32)
        # response positions in the shifted (T-1) frame: predicting token t+1
        B, T = ids.shape
        resp_mask = (jnp.arange(T - 1) >= (Tq - 1)).astype(jnp.float32)[None, :]
        resp_mask = jnp.broadcast_to(resp_mask, (B, T - 1))

        out = _ppo_update(
            self.params,
            self.value_params,
            self.ref_params,
            self._opt_state,
            ids,
            resp_mask,
            rewards,
            tx=self._tx,
            fwd=self._forward,
            cfg=cfg,
        )
        (self.params, self.value_params, self._opt_state, stats) = out
        s = PPOStepStats(**{k: float(v) for k, v in stats.items()})
        self.log_history.append(stats)
        return s


def _ppo_update(params, value_params, ref_params, opt_state, ids, resp_mask,
                rewards, *, tx, fwd, cfg):
    """Old logprobs/values + KL-shaped rewards + GAE, then ppo_epochs of
    clipped updates. Traced once per (B, T) shape."""

    old_lp, old_v = jax.tree.map(
        jax.lax.stop_gradient, fwd(params, value_params, ids)
    )
    ref_lp, _ = jax.tree.map(
        jax.lax.stop_gradient, fwd(ref_params, value_params, ids)
    )

    # per-token reward: -kl_coef·KL, + sequence reward at the last token
    kl = (old_lp - ref_lp) * resp_mask
    tok_rewards = -cfg.init_kl_coef * kl
    # add the scalar reward at the final response position
    T1 = ids.shape[1] - 1
    pos = jnp.argmax(
        jnp.cumsum(resp_mask, axis=1) * resp_mask, axis=1
    )  # index of last response token
    tok_rewards = tok_rewards.at[jnp.arange(ids.shape[0]), pos].add(rewards)

    # GAE over response tokens
    def gae_scan(carry, xs):
        adv_next, v_next = carry
        r, v, m = xs
        delta = r + cfg.gamma * v_next * m - v
        adv = delta + cfg.gamma * cfg.lam * adv_next * m
        return (adv, v), adv

    rs = jnp.flip(tok_rewards, 1).T  # (T1, B)
    vs = jnp.flip(old_v * resp_mask, 1).T
    ms = jnp.flip(resp_mask, 1).T
    (_, _), advs = jax.lax.scan(
        gae_scan,
        (jnp.zeros(ids.shape[0]), jnp.zeros(ids.shape[0])),
        (rs, vs, ms),
    )
    advantages = jnp.flip(advs.T, 1) * resp_mask
    returns = advantages + old_v * resp_mask
    # normalize advantages over response tokens
    n = jnp.maximum(jnp.sum(resp_mask), 1.0)
    mean = jnp.sum(advantages) / n
    var = jnp.sum((advantages - mean) ** 2 * resp_mask) / n
    advantages = (advantages - mean) * jax.lax.rsqrt(var + 1e-8) * resp_mask

    def loss_fn(trainable):
        p, vp = trainable
        lp, v = fwd(p, vp, ids)
        ratio = jnp.exp((lp - old_lp) * resp_mask)
        pg1 = -advantages * ratio
        pg2 = -advantages * jnp.clip(ratio, 1 - cfg.cliprange, 1 + cfg.cliprange)
        pg_loss = jnp.sum(jnp.maximum(pg1, pg2) * resp_mask) / n
        v_clip = old_v + jnp.clip(v - old_v, -cfg.cliprange_value,
                                  cfg.cliprange_value)
        vf = jnp.maximum((v - returns) ** 2, (v_clip - returns) ** 2)
        vf_loss = 0.5 * jnp.sum(vf * resp_mask) / n
        total = pg_loss + cfg.vf_coef * vf_loss
        return total, (pg_loss, vf_loss)

    trainable = (params, value_params)
    pg_l = vf_l = total = jnp.float32(0)
    for _ in range(cfg.ppo_epochs):
        (total, (pg_l, vf_l)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)

    params, value_params = trainable
    stats = {
        "loss": total,
        "policy_loss": pg_l,
        "value_loss": vf_l,
        "mean_kl": jnp.sum(kl) / n,
        "mean_reward": jnp.mean(rewards),
    }
    return params, value_params, opt_state, stats
