"""Training-layer tests: NLPTrainer train/QAT/prune/distill, LoRA/QLoRA
finetuning, DPO. Pattern: tiny models + loss-goes-down assertions
(reference: tests/CI/test_weight_only.py:212-256 QLoRA training;
tests/Nightly pruning/distillation suites)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_apply,
    llama_init_params,
)
from intel_extension_for_transformers_tpu.quantization import (
    QuantAwareTrainingConfig,
    RtnConfig,
    quantize_model,
)
from intel_extension_for_transformers_tpu.trainer import (
    DistillationConfig,
    DPOConfig,
    DPOTrainer,
    LoraConfig,
    NLPTrainer,
    PruningConfig,
    TrainingArguments,
    attach_lora,
    load_adapter,
    lora_init,
    merge_lora,
    save_adapter,
)
from intel_extension_for_transformers_tpu.trainer.trainer import causal_lm_loss


CFG = LlamaConfig.tiny(vocab_size=64, max_position_embeddings=64)


@pytest.fixture(scope="module")
def params():
    return llama_init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def dataset():
    # a learnable pattern: arithmetic token sequences mod vocab
    rng = np.random.default_rng(0)
    ds = []
    for _ in range(32):
        start = rng.integers(0, 64)
        seq = (start + np.arange(16)) % 64
        ds.append({"input_ids": seq.astype(np.int32)})
    return ds


def _args(**kw):
    base = dict(
        learning_rate=5e-3,
        max_steps=12,
        per_device_train_batch_size=4,
        logging_steps=4,
    )
    base.update(kw)
    return TrainingArguments(**base)


def test_train_loss_decreases(params, dataset):
    tr = NLPTrainer(params, CFG, args=_args(), train_dataset=dataset)
    before = tr.evaluate(dataset)["eval_loss"]
    out = tr.train()
    after = tr.evaluate(dataset)["eval_loss"]
    assert out.global_step == 12
    assert after < before, (before, after)


def test_qat_quantize(params, dataset):
    tr = NLPTrainer(params, CFG, args=_args(max_steps=4), train_dataset=dataset)
    qp = tr.quantize(QuantAwareTrainingConfig(weight_dtype="int4", group_size=32))
    assert qp.quantized_paths  # something got packed
    logits, _ = llama_apply(qp.params, CFG, jnp.arange(8, dtype=jnp.int32)[None, :])
    assert logits.shape == (1, 8, 64)


def test_prune_reaches_sparsity(params, dataset):
    tr = NLPTrainer(params, CFG, args=_args(max_steps=8), train_dataset=dataset)
    out = tr.prune(PruningConfig(target_sparsity=0.5, end_step=8))
    k = out.params["layers"][0]["mlp"]["gate"]["kernel"]
    sparsity = float(np.mean(np.asarray(k) == 0))
    assert sparsity > 0.45, sparsity


def test_distill(params, dataset):
    teacher = llama_init_params(jax.random.PRNGKey(7), CFG)
    tr = NLPTrainer(params, CFG, args=_args(max_steps=4), train_dataset=dataset)
    out = tr.distill(DistillationConfig(temperature=2.0), teacher_params=teacher)
    assert np.isfinite(out.training_loss)


# ------------------------------------------------------------------- LoRA


def test_lora_identity_at_init(params):
    cfg = LoraConfig(r=4)
    lora = lora_init(jax.random.PRNGKey(0), params, cfg)
    merged = attach_lora(params, lora, cfg.scaling)
    ids = jnp.arange(8, dtype=jnp.int32)[None, :]
    a, _ = llama_apply(params, CFG, ids)
    b, _ = llama_apply(merged, CFG, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_lora_train_and_merge(params, dataset):
    cfg = LoraConfig(r=4)
    lora = lora_init(jax.random.PRNGKey(0), params, cfg)

    def apply_fn(adapter, ids, mask=None):
        logits, _ = llama_apply(
            attach_lora(params, adapter, cfg.scaling), CFG, ids, None, mask
        )
        return logits

    tr = NLPTrainer(lora, apply_fn=apply_fn, args=_args(), train_dataset=dataset)
    ids = jnp.asarray(np.stack([d["input_ids"] for d in dataset[:4]]))
    before = float(causal_lm_loss(apply_fn(lora, ids), ids))
    out = tr.train()
    after = float(causal_lm_loss(apply_fn(out.params, ids), ids))
    assert after < before
    # merge == attach numerically (float base)
    merged = merge_lora(params, out.params, cfg.scaling)
    attached = attach_lora(params, out.params, cfg.scaling)
    a, _ = llama_apply(merged, CFG, ids[:1])
    b, _ = llama_apply(attached, CFG, ids[:1])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_qlora_on_quantized_base(params, dataset):
    """Adapter trains on a frozen int4 base (dequant backward through the
    WOQ matmul custom_vjp)."""
    qp = quantize_model(params, RtnConfig(weight_dtype="int4", group_size=32))
    cfg = LoraConfig(r=4)
    lora = lora_init(jax.random.PRNGKey(0), qp.params, cfg)

    def apply_fn(adapter, ids, mask=None):
        logits, _ = llama_apply(
            attach_lora(qp.params, adapter, cfg.scaling), CFG, ids, None, mask
        )
        return logits

    tr = NLPTrainer(
        lora, apply_fn=apply_fn, args=_args(max_steps=6), train_dataset=dataset
    )
    ids = jnp.asarray(np.stack([d["input_ids"] for d in dataset[:4]]))
    before = float(causal_lm_loss(apply_fn(lora, ids), ids))
    out = tr.train()
    after = float(causal_lm_loss(apply_fn(out.params, ids), ids))
    assert after < before
    # merging into a packed base must refuse
    with pytest.raises(ValueError):
        merge_lora(qp.params, out.params, cfg.scaling)


def test_adapter_save_load_roundtrip(params, tmp_path):
    cfg = LoraConfig(r=4)
    lora = lora_init(jax.random.PRNGKey(3), params, cfg)
    save_adapter(lora, cfg, str(tmp_path))
    loaded, cfg2 = load_adapter(str(tmp_path))
    assert cfg2.r == 4
    a = attach_lora(params, lora, cfg.scaling)
    b = attach_lora(params, loaded, cfg2.scaling)
    ids = jnp.arange(8, dtype=jnp.int32)[None, :]
    x, _ = llama_apply(a, CFG, ids)
    y, _ = llama_apply(b, CFG, ids)
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


# -------------------------------------------------------------------- DPO


def test_dpo_training(params):
    rng = np.random.default_rng(0)
    chosen = rng.integers(0, 64, size=(4, 12)).astype(np.int32)
    rejected = rng.integers(0, 64, size=(4, 12)).astype(np.int32)
    mask = np.ones((4, 12), np.int32)
    mask[:, :4] = 0  # first tokens = prompt
    batch = {
        "chosen_input_ids": chosen,
        "chosen_labels_mask": mask,
        "rejected_input_ids": rejected,
        "rejected_labels_mask": mask,
    }
    batches = [batch] * 16  # fixed pairs: the policy can learn the preference

    def apply_fn(p, ids):
        logits, _ = llama_apply(p, CFG, ids)
        return logits

    tr = DPOTrainer(
        params,
        apply_fn,
        DPOConfig(beta=0.1, learning_rate=1e-3, max_steps=8, logging_steps=2),
        train_dataset=batches,
    )
    out = tr.train()
    assert np.isfinite(out.training_loss)
    # DPO pushes chosen above rejected: reward acc should rise above chance
    assert out.log_history[-1]["reward_acc"] >= 0.5


# -------------------------------------------------------------- finetuning


def test_finetuning_end_to_end(params, tmp_path):
    from intel_extension_for_transformers_tpu.neural_chat.config import (
        FinetuningConfig,
    )
    from intel_extension_for_transformers_tpu.trainer import Finetuning

    cfg = FinetuningConfig(
        model_name_or_path="tiny",
        max_steps=4,
        per_device_train_batch_size=2,
        max_seq_length=32,
        output_dir=str(tmp_path / "adapter"),
    )

    class ModTokenizer:  # maps bytes into the tiny 64-token vocab
        def encode(self, text):
            return [b % 64 for b in text.encode()]

    tok = ModTokenizer()
    lora, lora_cfg = Finetuning(cfg).finetune(
        params=params,
        model_config=CFG,
        tokenizer=tok,
        texts=["hello world " * 20, "the quick brown fox " * 15],
    )
    loaded, _ = load_adapter(cfg.output_dir)
    assert loaded["layers"][0]["attention"]["q"]["a"].shape[1] == lora_cfg.r


def test_fsdp_sharded_training(params, dataset):
    """ZeRO-style training: params AND optimizer state sharded over
    fsdp×tp, batch over dp — loss decreases and shards stay distributed."""
    from intel_extension_for_transformers_tpu.models.llama import (
        llama_param_axes,
    )
    from intel_extension_for_transformers_tpu.parallel import create_mesh

    mesh = create_mesh(dp=2, fsdp=2, tp=2)
    tr = NLPTrainer(
        params, CFG, args=_args(max_steps=6), train_dataset=dataset,
        mesh=mesh, param_axes=llama_param_axes(CFG),
    )
    k = tr.params["layers"][0]["mlp"]["gate"]["kernel"]
    assert not k.sharding.is_fully_replicated  # fsdp/tp actually sharded
    before = tr.evaluate(dataset)["eval_loss"]
    out = tr.train()
    after = tr.evaluate(dataset)["eval_loss"]
    assert after < before
    k2 = out.params["layers"][0]["mlp"]["gate"]["kernel"]
    assert not k2.sharding.is_fully_replicated  # stays sharded through train


def test_pipeline_parallel_training(params, dataset):
    """GPipe training through the trainer: pp=2 × dp=4 — loss decreases,
    staged layers stay pp-sharded, and TrainOutput.params comes back in the
    standard llama layout (eval parity with llama_apply)."""
    from intel_extension_for_transformers_tpu.models.llama import llama_apply
    from intel_extension_for_transformers_tpu.parallel import create_mesh

    mesh = create_mesh(dp=4, pp=2)
    tr = NLPTrainer(
        params, CFG, args=_args(max_steps=8), train_dataset=dataset,
        mesh=mesh, pipeline_stages=2, pipeline_microbatches=2,
    )
    staged_leaf = jax.tree.leaves(tr.params["staged"])[0]
    assert not staged_leaf.sharding.is_fully_replicated  # layers on pp
    before = tr.evaluate(dataset)["eval_loss"]
    out = tr.train()
    after = tr.evaluate(dataset)["eval_loss"]
    assert after < before, (before, after)

    # merged tree runs through the plain forward and matches the pipeline
    merged = out.params
    assert len(merged["layers"]) == CFG.num_hidden_layers
    ids = jnp.asarray(
        np.stack([d["input_ids"] for d in dataset[:4]]), jnp.int32
    )
    ref, _ = llama_apply(merged, CFG, ids)
    got = tr.apply_fn(tr.params, ids)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-4, atol=3e-4
    )


def test_prefetch_to_device_order_and_errors():
    """utils/prefetch.py: preserves order, places on device, and surfaces
    producer exceptions on the consumer side."""
    from intel_extension_for_transformers_tpu.utils.prefetch import (
        prefetch_to_device,
    )

    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        assert float(b["x"][0, 0]) == i

    def bad():
        yield {"x": np.zeros((1,), np.float32)}
        raise RuntimeError("producer boom")

    it = prefetch_to_device(bad(), size=1)
    next(it)
    with pytest.raises(RuntimeError, match="producer boom"):
        list(it)


def test_gradient_checkpointing_grads_identical(params, dataset):
    """remat=True must change memory, not math: grads bit-match the plain
    backward, and the trainer trains with it on."""
    from intel_extension_for_transformers_tpu.models.llama import llama_apply

    ids = jnp.asarray(np.stack([d["input_ids"] for d in dataset[:4]]), jnp.int32)

    def loss(p, remat):
        logits, _ = llama_apply(p, CFG, ids, remat=remat)
        oh = jax.nn.one_hot(ids[:, 1:], CFG.vocab_size)
        ll = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        return -jnp.mean(jnp.sum(ll * oh, -1))

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    tr = NLPTrainer(
        params, CFG,
        args=_args(max_steps=4, gradient_checkpointing=True),
        train_dataset=dataset,
    )
    before = tr.evaluate(dataset)["eval_loss"]
    tr.train()
    assert tr.evaluate(dataset)["eval_loss"] < before


def test_pipeline_stage_validation(params):
    from intel_extension_for_transformers_tpu.parallel import create_mesh

    with pytest.raises(ValueError, match="pp axis"):
        NLPTrainer(params, CFG, mesh=create_mesh(dp=8), pipeline_stages=2)
