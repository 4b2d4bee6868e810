"""PPO trainer and NLPTrainer checkpoint/resume tests (reference:
ppo_trainer.py, trl value head; HF resume_from_checkpoint)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_init_params,
)
from intel_extension_for_transformers_tpu.trainer import (
    NLPTrainer,
    PPOConfig,
    PPOTrainer,
    TrainingArguments,
)

CFG = LlamaConfig.tiny(vocab_size=64, max_position_embeddings=64)


@pytest.fixture(scope="module")
def params():
    return llama_init_params(jax.random.PRNGKey(0), CFG)


# ---------------------------------------------------------------- PPO


def test_ppo_prefers_rewarded_sequences(params):
    """PPO must raise the logprob of +1-rewarded responses RELATIVE to
    -1-rewarded ones (advantages are whitened, so only relative reward
    matters — same as trl)."""
    tr = PPOTrainer(
        params,
        CFG,
        PPOConfig(learning_rate=5e-4, ppo_epochs=4, init_kl_coef=0.01),
    )
    rng = np.random.default_rng(0)
    q = rng.integers(0, 64, (4, 6)).astype(np.int32)
    r = rng.integers(0, 64, (4, 8)).astype(np.int32)
    rewards = np.asarray([1.0, 1.0, -1.0, -1.0], np.float32)

    ids = jnp.asarray(np.concatenate([q, r], 1), jnp.int32)

    def gap(p):
        lp, _ = tr._forward(p, tr.value_params, ids)
        resp = lp[:, q.shape[1] - 1 :]
        per_seq = jnp.mean(resp, axis=1)
        return float(jnp.mean(per_seq[:2]) - jnp.mean(per_seq[2:]))

    before = gap(tr.params)
    stats = None
    for _ in range(4):
        stats = tr.step(q, r, rewards)
    after = gap(tr.params)
    assert np.isfinite(stats.loss)
    assert after > before, (before, after)
    assert stats.mean_reward == 0.0


def test_ppo_stats_fields(params):
    tr = PPOTrainer(params, CFG, PPOConfig(ppo_epochs=1))
    q = np.arange(8, dtype=np.int32).reshape(2, 4) % 64
    r = (np.arange(12, dtype=np.int32).reshape(2, 6) + 3) % 64
    s = tr.step(q, r, np.asarray([0.5, -0.5], np.float32))
    for f in ("loss", "policy_loss", "value_loss", "mean_kl", "mean_reward"):
        assert np.isfinite(getattr(s, f))


# ------------------------------------------------------ checkpoint/resume


def test_checkpoint_save_resume(params, tmp_path):
    rng = np.random.default_rng(0)
    ds = [
        {"input_ids": ((s + np.arange(16)) % 64).astype(np.int32)}
        for s in rng.integers(0, 64, 32)
    ]
    out = str(tmp_path / "run")

    # train 6 steps with checkpointing every 3
    args = TrainingArguments(
        learning_rate=5e-3, max_steps=6, per_device_train_batch_size=4,
        logging_steps=2, save_steps=3, output_dir=out,
    )
    tr = NLPTrainer(params, CFG, args=args, train_dataset=ds)
    full = tr.train()
    assert full.global_step == 6

    # train 3 steps fresh, then resume to 6 — must reach the same step count
    args2 = TrainingArguments(
        learning_rate=5e-3, max_steps=3, per_device_train_batch_size=4,
        logging_steps=2, save_steps=3, output_dir=str(tmp_path / "run2"),
    )
    tr2 = NLPTrainer(params, CFG, args=args2, train_dataset=ds)
    half = tr2.train()
    assert half.global_step == 3

    args3 = TrainingArguments(
        learning_rate=5e-3, max_steps=6, per_device_train_batch_size=4,
        logging_steps=2, output_dir=str(tmp_path / "run3"),
    )
    tr3 = NLPTrainer(params, CFG, args=args3, train_dataset=ds)
    resumed = tr3.train(resume_from_checkpoint=str(tmp_path / "run2"))
    assert resumed.global_step == 6
    # resumed weights differ from the fresh-half weights (training continued)
    a = resumed.params["layers"][0]["mlp"]["gate"]["kernel"]
    b = half.params["layers"][0]["mlp"]["gate"]["kernel"]
    assert not np.allclose(np.asarray(a), np.asarray(b))
