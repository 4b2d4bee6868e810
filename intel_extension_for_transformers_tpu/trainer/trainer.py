"""NLPTrainer: compression-aware training on a device mesh.

Re-creation of the reference's trainer surface
(reference: transformers/trainer.py — `quantize` :281, `prune` :333,
`distill` :362, `orchestrate_optimizations` :397, overridden `train` :428,
`benchmark` :1896; `NLPTrainer` :2033) designed TPU-first:

- one jitted train step (loss → grad → optax update) with donated state;
  batches sharded over the mesh "dp" axis, params replicated — the DDP/ccl
  analogue is a psum XLA inserts from the sharding, not a framework layer.
- compression is a *loss/params transform*, not a callback web: QAT wraps the
  forward in straight-through fake-quant; pruning applies magnitude masks to
  the same jitted step; distillation adds a KL term against a frozen teacher
  computed in the same program.
"""

from __future__ import annotations

import logging
import math
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Iterable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from intel_extension_for_transformers_tpu.quantization.config import (
    QuantAwareTrainingConfig,
    QuantizationConfigMixin,
)
from intel_extension_for_transformers_tpu.trainer.configs import (
    DistillationConfig,
    PruningConfig,
    TrainingArguments,
)

logger = logging.getLogger(__name__)


@dataclass
class TrainOutput:
    params: Any
    global_step: int
    training_loss: float
    log_history: list


def causal_lm_loss(logits: jax.Array, input_ids: jax.Array, mask=None) -> jax.Array:
    """Shifted next-token cross-entropy in f32; mask (B,T) 1=count."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = input_ids[:, 1:]
    ll = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(ll, targets[..., None], axis=-1)[..., 0]
    if mask is not None:
        m = mask[:, 1:].astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(nll)


def _batch_iterator(dataset, batch_size: int, epochs: int, max_steps: int, seed: int):
    """dataset: list/sequence of dicts of (T,) arrays, or an iterable of
    ready batches (dicts of (B,T) arrays). Yields batches."""
    first = dataset[0] if hasattr(dataset, "__getitem__") else None
    if first is not None and np.asarray(first["input_ids"]).ndim == 1:
        n = len(dataset)
        rng = np.random.default_rng(seed)
        step = 0
        for _ in range(max(1, epochs if max_steps <= 0 else 10**9)):
            order = rng.permutation(n)
            for i in range(0, n - batch_size + 1, batch_size):
                idx = order[i : i + batch_size]
                keys = dataset[0].keys()
                yield {
                    k: np.stack([np.asarray(dataset[j][k]) for j in idx]) for k in keys
                }
                step += 1
                if max_steps > 0 and step >= max_steps:
                    return
    else:
        step = 0
        for _ in range(max(1, epochs if max_steps <= 0 else 10**9)):
            for b in dataset:
                yield b
                step += 1
                if max_steps > 0 and step >= max_steps:
                    return
            if not hasattr(dataset, "__getitem__"):
                return  # one-shot iterable


class NLPTrainer:
    """Functional trainer: owns (params, optimizer state), steps are pure.

    apply_fn(params, input_ids, attention_mask) → logits. Defaults to the
    Llama forward when model_config is a LlamaConfig.
    """

    def __init__(
        self,
        params: Any,
        model_config: Any = None,
        apply_fn: Optional[Callable] = None,
        args: Optional[TrainingArguments] = None,
        train_dataset=None,
        eval_dataset=None,
        trainable_filter: Optional[Callable[[Any], Any]] = None,
        mesh=None,
        param_axes: Any = None,  # logical axes → params (+opt state) shard
        pipeline_stages: int = 1,  # >1: GPipe over the mesh `pp` axis
        pipeline_microbatches: int = 2,
    ):
        self.params = params
        self.model_config = model_config
        self.args = args or TrainingArguments()
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.mesh = mesh
        self.param_axes = param_axes
        self.pipeline_stages = int(pipeline_stages)
        self.pipeline_microbatches = int(pipeline_microbatches)
        self.log_history: list = []
        if mesh is not None and param_axes is not None:
            # ZeRO-style: params placed by their logical axes (tp/fsdp rules);
            # optimizer moments inherit the same sharding from tx.init, so
            # grads/updates stay distributed — the deepspeed-zero analogue
            # (reference: finetuning.py:415-417) with XLA collectives
            from intel_extension_for_transformers_tpu.parallel import (
                shard_params,
            )

            rules = None
            if "fsdp" in mesh.shape and mesh.shape["fsdp"] > 1:
                # shard the stacked (input) dim of every kernel over fsdp
                rules = {"embed": "fsdp"}
            self.params = shard_params(params, param_axes, mesh, rules=rules)

        if self.pipeline_stages > 1:
            # GPipe: layer stack splits over the mesh `pp` axis
            # (parallel/pipeline.py); embed/head stay in `base`. Composes
            # with dp batch sharding; not with param_axes sharding or a
            # custom apply_fn. Batches must be unpadded (the rotating
            # activation buffer is mask-free).
            if mesh is None or mesh.shape.get("pp", 1) != self.pipeline_stages:
                raise ValueError(
                    "pipeline_stages requires mesh with a pp axis of that size"
                )
            if param_axes is not None or apply_fn is not None:
                raise ValueError(
                    "pipeline_stages is exclusive with param_axes/apply_fn"
                )
            from intel_extension_for_transformers_tpu.parallel import (
                llama_pipeline_forward,
                llama_stage_params,
            )

            staged = llama_stage_params(self.params, model_config, mesh)
            base = {k: v for k, v in self.params.items() if k != "layers"}
            self.params = {"base": base, "staged": staged}

            def apply_fn(p, ids, mask=None):
                return llama_pipeline_forward(
                    p["base"], p["staged"], self.model_config, ids,
                    mesh=self.mesh,
                    num_microbatches=self.pipeline_microbatches,
                )

        elif apply_fn is None:
            from intel_extension_for_transformers_tpu.models.llama import llama_apply

            def apply_fn(p, ids, mask=None):
                logits, _ = llama_apply(
                    p, self.model_config, ids, None, mask,
                    remat=self.args.gradient_checkpointing,
                )
                return logits

        self.apply_fn = apply_fn

    def merged_params(self) -> Any:
        """Pipeline-staged trees re-assembled into the standard llama tree
        (no-op without pipeline_stages)."""
        if self.pipeline_stages <= 1:
            return self.params
        stacked = jax.tree.map(
            lambda x: x.reshape(-1, *x.shape[2:]), self.params["staged"]
        )
        L = self.model_config.num_hidden_layers
        layers = [jax.tree.map(lambda x: x[i], stacked) for i in range(L)]
        return {**self.params["base"], "layers": layers}

    # ------------------------------------------------------------- core
    def _optimizer(self):
        a = self.args
        if a.warmup_steps > 0:
            lr = optax.linear_schedule(0.0, a.learning_rate, a.warmup_steps)
        else:
            lr = a.learning_rate
        tx = optax.chain(
            optax.clip_by_global_norm(a.max_grad_norm),
            optax.adamw(lr, weight_decay=a.weight_decay),
        )
        if a.gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, a.gradient_accumulation_steps)
        return tx

    def _shard_batch(self, batch: dict) -> dict:
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P("dp", None))
        return {k: jax.device_put(jnp.asarray(v), sh) for k, v in batch.items()}

    def _make_step(self, loss_fn):
        tx = self._optimizer()

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(trainable, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(trainable, batch)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss

        return tx, step

    def _run(
        self, loss_fn, trainable, hook=None, resume_from_checkpoint=None
    ) -> tuple[Any, float]:
        """Generic loop: returns (trained trainable-tree, last loss)."""
        a = self.args
        tx, step = self._make_step(loss_fn)
        # the step donates its inputs (in-place buffer reuse on device);
        # copy once so the CALLER's arrays are never invalidated
        trainable = jax.tree.map(jnp.copy, trainable)
        opt_state = tx.init(trainable)
        start_step = 0
        if resume_from_checkpoint:
            trainable, opt_state, start_step = self._restore(
                resume_from_checkpoint, trainable, opt_state
            )
            logger.info("resumed from %s at step %d", resume_from_checkpoint,
                        start_step)
        it = _batch_iterator(
            self.train_dataset,
            a.per_device_train_batch_size,
            a.num_train_epochs,
            a.max_steps,
            a.seed,
        )
        # background host→device pipeline: batch N+1 stages while step N
        # computes (utils/prefetch.py; the grain/tf.data role, SURVEY §7)
        from intel_extension_for_transformers_tpu.utils.prefetch import (
            prefetch_to_device,
        )

        sh = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P("dp", None))
        it = prefetch_to_device(it, size=2, sharding=sh)
        t0 = time.time()
        loss_val, gstep = float("nan"), start_step
        for batch in it:
            if a.max_steps > 0 and gstep >= a.max_steps:
                break  # max_steps is a GLOBAL budget (resume continues it)
            trainable, opt_state, loss = step(trainable, opt_state, batch)
            gstep += 1
            if hook is not None:
                trainable = hook(gstep, trainable)
            if gstep % a.logging_steps == 0 or gstep == start_step + 1:
                loss_val = float(loss)
                rec = {"step": gstep, "loss": loss_val, "time": time.time() - t0}
                self.log_history.append(rec)
                logger.info("step %d loss %.4f", gstep, loss_val)
            if (
                a.save_steps > 0
                and a.output_dir
                and gstep % a.save_steps == 0
            ):
                self._save(a.output_dir, trainable, opt_state, gstep)
        if math.isnan(loss_val):
            loss_val = float(loss) if gstep > start_step else float("nan")
        if a.save_steps > 0 and a.output_dir and gstep > start_step:
            self._save(a.output_dir, trainable, opt_state, gstep)
        return trainable, loss_val, gstep

    # ----------------------------------------------- checkpoint / resume
    # (reference: HF resume_from_checkpoint passthrough, trainer.py:146-152;
    #  here orbax — the TPU-native checkpoint layer)
    def _ckpt_dir(self, output_dir: str) -> str:
        import os

        return os.path.abspath(os.path.join(output_dir, "checkpoint"))

    def _save(self, output_dir: str, trainable, opt_state, step: int) -> None:
        import orbax.checkpoint as ocp

        path = self._ckpt_dir(output_dir)
        with ocp.PyTreeCheckpointer() as ck:
            ck.save(
                path,
                {"trainable": trainable, "opt_state": opt_state,
                 "step": step},
                force=True,
            )
        logger.info("checkpoint saved: %s (step %d)", path, step)

    def _restore(self, path_or_dir: str, trainable, opt_state):
        import os

        import orbax.checkpoint as ocp

        path = path_or_dir
        if os.path.isdir(os.path.join(path_or_dir, "checkpoint")):
            path = self._ckpt_dir(path_or_dir)
        template = {"trainable": trainable, "opt_state": opt_state, "step": 0}
        with ocp.PyTreeCheckpointer() as ck:
            got = ck.restore(os.path.abspath(path), item=template)
        return got["trainable"], got["opt_state"], int(got["step"])

    # ------------------------------------------------------------ train
    def train(self, resume_from_checkpoint: Optional[str] = None) -> TrainOutput:
        """Full-parameter causal-LM training (reference: trainer.py:428;
        resume_from_checkpoint restores params+optimizer+step)."""

        def loss_fn(params, batch):
            logits = self.apply_fn(
                params, batch["input_ids"], batch.get("attention_mask")
            )
            return causal_lm_loss(
                logits, batch["input_ids"], batch.get("attention_mask")
            )

        params, loss, steps = self._run(
            loss_fn, self.params, resume_from_checkpoint=resume_from_checkpoint
        )
        self.params = params
        return TrainOutput(self.merged_params(), steps, loss, self.log_history)

    # ----------------------------------------------------------- evaluate
    def evaluate(self, dataset=None) -> dict:
        dataset = dataset if dataset is not None else self.eval_dataset
        a = self.args

        @jax.jit
        def eval_loss(params, batch):
            logits = self.apply_fn(
                params, batch["input_ids"], batch.get("attention_mask")
            )
            return causal_lm_loss(
                logits, batch["input_ids"], batch.get("attention_mask")
            )

        losses = []
        for batch in _batch_iterator(
            dataset, a.per_device_train_batch_size, 1, -1, a.seed
        ):
            losses.append(float(eval_loss(self.params, self._shard_batch(batch))))
        mean = float(np.mean(losses)) if losses else float("nan")
        return {"eval_loss": mean, "perplexity": float(np.exp(min(mean, 30.0)))}

    # ----------------------------------------------------------- quantize
    def quantize(
        self,
        quant_config: QuantizationConfigMixin,
        calib_inputs=None,
        *,
        eval_tasks=None,
        tokenizer=None,
        accuracy_criterion: float = 0.01,
        fallback_configs=None,
        metric=None,
        eval_batch_size: int = 32,
    ):
        """PTQ directly, or QAT (straight-through fake quant during training,
        then real quantization) for QuantAwareTrainingConfig
        (reference: trainer.py:281 `quantize`, `_inc_quantize` :251).

        Accuracy-driven tuning (reference: builtin_eval_func loop,
        trainer.py:190-281): with `eval_tasks` (names from evaluation.tasks)
        and a `tokenizer`, the fp32 model is scored first; after quantization
        the same tasks re-run and, if the mean `acc` drop exceeds
        `accuracy_criterion` (relative), each config in `fallback_configs`
        (default: same algorithm at smaller group_size, then int8) is tried
        until one passes. The last fallback is returned even if it misses the
        bar, with `accuracy_ok=False` recorded in `self.last_quant_report`.
        """
        from intel_extension_for_transformers_tpu.quantization import quantize_model
        from intel_extension_for_transformers_tpu.quantization.quantize import (
            default_is_quantizable,
            fake_quant,
        )

        if isinstance(quant_config, QuantAwareTrainingConfig):
            bits = 4 if "4" in quant_config.weight_dtype else 8
            gs = quant_config.group_size

            def qat_transform(params):
                def fq(path, leaf):
                    p = "/".join(str(getattr(x, "key", getattr(x, "idx", x)))
                                 for x in path)
                    if default_is_quantizable(p, leaf):
                        return fake_quant(leaf, bits=bits, group_size=gs)
                    return leaf

                return jax.tree_util.tree_map_with_path(fq, params)

            def loss_fn(params, batch):
                logits = self.apply_fn(
                    qat_transform(params),
                    batch["input_ids"],
                    batch.get("attention_mask"),
                )
                return causal_lm_loss(
                    logits, batch["input_ids"], batch.get("attention_mask")
                )

            params, _, _ = self._run(loss_fn, self.params)
            self.params = params

        relative = True
        if metric is not None:
            # reference-style Metric spec (transformers/utils/metrics.py:19,
            # mirrored in transformers.utils.metrics here): its criterion IS
            # the accuracy gate, and is_relative selects relative-vs-absolute
            # drop semantics
            accuracy_criterion = metric.criterion
            relative = bool(getattr(metric, "is_relative", True))

        if not eval_tasks:
            return quantize_model(self.params, quant_config, calib_inputs=calib_inputs)
        return self._quantize_with_accuracy_gate(
            quant_config,
            calib_inputs,
            eval_tasks=eval_tasks,
            tokenizer=tokenizer,
            accuracy_criterion=accuracy_criterion,
            fallback_configs=fallback_configs,
            relative=relative,
            eval_batch_size=eval_batch_size,
        )

    def _quantize_with_accuracy_gate(
        self, quant_config, calib_inputs, *, eval_tasks, tokenizer,
        accuracy_criterion, fallback_configs, relative=True,
        eval_batch_size=32,
    ):
        import dataclasses

        from intel_extension_for_transformers_tpu.evaluation.tasks import evaluate
        from intel_extension_for_transformers_tpu.quantization import quantize_model

        def score(params):
            res = evaluate(params, self.model_config, tokenizer, eval_tasks,
                           batch_size=eval_batch_size)
            # acc where a task reports it; perplexity-only tasks contribute
            # exp(-nll) = 1/ppl (mean per-token probability) — an acc-like
            # quantity in (0, 1) whose RELATIVE drop mirrors a ppl rise, so
            # a gate on tasks like `synthetic_ppl` discriminates quantization
            # damage even when n-small accuracy tasks are at chance
            goods = []
            for m in res.values():
                if "acc" in m:
                    goods.append(m["acc"])
                elif "ppl" in m:
                    goods.append(1.0 / max(float(m["ppl"]), 1e-9))
            return (sum(goods) / len(goods)) if goods else 0.0, res

        base_acc, base_res = score(self.params)
        candidates = [quant_config]
        if fallback_configs is not None:
            candidates += list(fallback_configs)
        else:
            # default ladder: halve group size, then int8 (reference INC
            # tuning space: alg → smaller groups → wider dtype)
            gs = getattr(quant_config, "group_size", 128) or 128
            if gs > 32:
                candidates.append(dataclasses.replace(quant_config, group_size=32))
            if getattr(quant_config, "weight_dtype", "int4") != "int8":
                try:
                    candidates.append(
                        dataclasses.replace(quant_config, weight_dtype="int8")
                    )
                except (TypeError, ValueError):
                    pass

        report = {"fp32_acc": base_acc, "fp32_results": base_res, "attempts": []}
        qmodel = None
        for cand in candidates:
            qmodel = quantize_model(self.params, cand, calib_inputs=calib_inputs)
            q_acc, q_res = score(qmodel.params)
            drop = base_acc - q_acc
            if relative:
                drop = drop / max(abs(base_acc), 1e-9)
            ok = drop <= accuracy_criterion
            report["attempts"].append(
                {"config": type(cand).__name__,
                 "group_size": getattr(cand, "group_size", None),
                 "weight_dtype": getattr(cand, "weight_dtype", None),
                 "acc": q_acc, "rel_drop": drop, "ok": ok}
            )
            if ok:
                report["accuracy_ok"] = True
                self.last_quant_report = report
                return qmodel
        report["accuracy_ok"] = False
        self.last_quant_report = report
        return qmodel

    # -------------------------------------------------------------- prune
    def prune(self, pruning_config: Optional[PruningConfig] = None) -> TrainOutput:
        """Magnitude pruning with cubic schedule; masks re-applied after each
        step so pruned weights stay zero (reference: trainer.py:333)."""
        cfg = pruning_config or PruningConfig()
        a = self.args
        total = a.max_steps if a.max_steps > 0 else 1000
        end = cfg.end_step if cfg.end_step > 0 else total

        def sparsity_at(step: int) -> float:
            if step <= cfg.start_step:
                return 0.0
            if step >= end:
                return cfg.target_sparsity
            frac = (step - cfg.start_step) / max(1, end - cfg.start_step)
            return cfg.target_sparsity * (1 - (1 - frac) ** 3)

        def prunable(path: str, leaf) -> bool:
            if any(x in path for x in cfg.excluded_names):
                return False
            return (
                hasattr(leaf, "ndim")
                and leaf.ndim == 2
                and "embed" not in path
                and "kernel" in path
            )

        from intel_extension_for_transformers_tpu.quantization.quantize import (
            _path_str,
        )

        @partial(jax.jit, static_argnums=())
        def apply_masks(params, sparsity):
            def mask(path, leaf):
                if not prunable(_path_str(path), leaf):
                    return leaf
                flat = jnp.abs(leaf).ravel()
                k = (sparsity * flat.size).astype(jnp.int32)
                thresh = jnp.where(
                    k > 0, jnp.sort(flat)[jnp.clip(k - 1, 0, flat.size - 1)], -1.0
                )
                return jnp.where(jnp.abs(leaf) > thresh, leaf, 0.0)

            return jax.tree_util.tree_map_with_path(mask, params)

        def loss_fn(params, batch):
            logits = self.apply_fn(
                params, batch["input_ids"], batch.get("attention_mask")
            )
            return causal_lm_loss(
                logits, batch["input_ids"], batch.get("attention_mask")
            )

        def hook(step, params):
            if step % cfg.update_frequency:
                return params
            return apply_masks(params, jnp.float32(sparsity_at(step)))

        params, loss, steps = self._run(loss_fn, self.params, hook=hook)
        self.params = apply_masks(params, jnp.float32(cfg.target_sparsity))
        return TrainOutput(self.params, steps, loss, self.log_history)

    # ------------------------------------------------------------ distill
    def distill(
        self,
        distillation_config: Optional[DistillationConfig] = None,
        teacher_params: Any = None,
        teacher_apply_fn: Optional[Callable] = None,
    ) -> TrainOutput:
        """Knowledge distillation (reference: trainer.py:362): loss =
        α·CE(hard) + (1-α)·T²·KL(student‖teacher)."""
        cfg = distillation_config or DistillationConfig()
        assert teacher_params is not None, "distill needs teacher_params"
        teacher_fn = teacher_apply_fn or self.apply_fn
        T = cfg.temperature

        def loss_fn(params, batch):
            ids, mask = batch["input_ids"], batch.get("attention_mask")
            s_logits = self.apply_fn(params, ids, mask).astype(jnp.float32)
            t_logits = jax.lax.stop_gradient(
                teacher_fn(teacher_params, ids, mask)
            ).astype(jnp.float32)
            ce = causal_lm_loss(s_logits, ids, mask)
            sp = jax.nn.log_softmax(s_logits[:, :-1] / T, axis=-1)
            tp = jax.nn.softmax(t_logits[:, :-1] / T, axis=-1)
            kl = jnp.sum(tp * (jnp.log(jnp.maximum(tp, 1e-9)) - sp), axis=-1)
            if mask is not None:
                m = mask[:, 1:].astype(jnp.float32)
                kl = jnp.sum(kl * m) / jnp.maximum(jnp.sum(m), 1.0)
            else:
                kl = jnp.mean(kl)
            return cfg.alpha_ce * ce + (1 - cfg.alpha_ce) * (T * T) * kl

        params, loss, steps = self._run(loss_fn, self.params)
        self.params = params
        return TrainOutput(params, steps, loss, self.log_history)

    # ------------------------------------------------- orchestrate (combo)
    def orchestrate_optimizations(
        self,
        pruning_config: Optional[PruningConfig] = None,
        distillation_config: Optional[DistillationConfig] = None,
        teacher_params: Any = None,
        quant_config: Optional[QuantizationConfigMixin] = None,
    ):
        """Prune-while-distilling, then quantize (reference: trainer.py:397
        `orchestrate_optimizations` — INC prepare_compression combo)."""
        if distillation_config is not None and teacher_params is not None:
            self.distill(distillation_config, teacher_params)
        if pruning_config is not None:
            self.prune(pruning_config)
        if quant_config is not None:
            return self.quantize(quant_config)
        return self.params

    # ----------------------------------------------------------- benchmark
    def benchmark(self, batch: Optional[dict] = None, iters: int = 10) -> dict:
        """Latency/throughput probe (reference: trainer.py:1896 + P23
        benchmark.py): times the jitted forward on a representative batch."""
        if batch is None:
            ds = self.train_dataset or self.eval_dataset
            it = _batch_iterator(ds, self.args.per_device_train_batch_size, 1, 1,
                                 self.args.seed)
            batch = next(it)
        batch = self._shard_batch(batch)

        @jax.jit
        def fwd(params, ids, mask):
            return self.apply_fn(params, ids, mask)

        ids, mask = batch["input_ids"], batch.get("attention_mask")
        fwd(self.params, ids, mask).block_until_ready()  # compile
        t0 = time.time()
        for _ in range(iters):
            out = fwd(self.params, ids, mask)
        out.block_until_ready()
        dt = (time.time() - t0) / iters
        B, T = np.asarray(ids).shape
        return {
            "latency_ms": dt * 1e3,
            "throughput_samples_per_s": B / dt,
            "throughput_tokens_per_s": B * T / dt,
        }


class NLPSeq2SeqTrainer(NLPTrainer):
    """Parity alias (reference: trainer.py:2040) — same functional loop;
    seq2seq models supply their own apply_fn/loss via construction."""
