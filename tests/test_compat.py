"""Reference import-path compatibility layer
(`intel_extension_for_transformers_tpu.transformers` mirrors
intel_extension_for_transformers/transformers/__init__.py:19-49)."""

import numpy as np
import torch
import transformers as hf


def test_reference_import_surface():
    """Every name the reference exports from .transformers resolves here."""
    import intel_extension_for_transformers_tpu.transformers as c

    for name in [
        "WEIGHTS_NAME", "BenchmarkConfig", "DynamicLengthConfig", "Provider",
        "PrunerV2", "MixedPrecisionConfig", "BitsAndBytesConfig",
        "SmoothQuantConfig", "StaticQuantConfig", "DynamicQuantConfig",
        "QuantAwareTrainingConfig", "RtnConfig", "AwqConfig", "TeqConfig",
        "GPTQConfig", "AutoRoundConfig", "metrics", "objectives",
        "LazyImport", "AutoModelForCausalLM", "AutoModel",
        "AutoModelForSeq2SeqLM", "OptimizedModel",
    ]:
        assert hasattr(c, name), name

    # submodule-style reference imports
    from intel_extension_for_transformers_tpu.transformers.modeling import (
        AutoModelForCausalLM,  # noqa: F401
    )
    from intel_extension_for_transformers_tpu.transformers.trainer import (
        NLPTrainer,  # noqa: F401
    )
    from intel_extension_for_transformers_tpu.transformers.utils import (
        metrics,
        objectives,
    )

    m = metrics.Metric(name="eval_accuracy", is_relative=True, criterion=0.02)
    assert m.criterion == 0.02
    assert objectives.performance.greater_is_better


def test_bitsandbytes_config_maps_to_rtn():
    from intel_extension_for_transformers_tpu.quantization.config import (
        RtnConfig,
    )
    from intel_extension_for_transformers_tpu.transformers import (
        BitsAndBytesConfig,
    )

    qc = BitsAndBytesConfig(load_in_4bit=True, bnb_4bit_quant_type="nf4",
                            bnb_4bit_use_double_quant=True)
    assert isinstance(qc, RtnConfig) and qc.weight_dtype == "nf4"
    qc8 = BitsAndBytesConfig(load_in_8bit=True)
    assert isinstance(qc8, RtnConfig) and qc8.weight_dtype == "int8"


def test_prunerv2_maps_to_pruning_config():
    from intel_extension_for_transformers_tpu.trainer.configs import (
        PruningConfig,
    )
    from intel_extension_for_transformers_tpu.transformers import PrunerV2

    pc = PrunerV2(target_sparsity=0.8, pruning_type="magnitude",
                  start_step=5, pruning_frequency=2,
                  excluded_op_names=["embed"], pattern="4x1")
    assert isinstance(pc, PruningConfig)
    assert pc.target_sparsity == 0.8 and pc.update_frequency == 2
    assert pc.excluded_names == ["embed"]


def test_reference_style_quantize_flow():
    """The reference's canonical snippet, package name swapped: quantize a
    causal LM via BitsAndBytesConfig and generate."""
    from intel_extension_for_transformers_tpu.models.generation import (
        SamplingConfig,
    )
    from intel_extension_for_transformers_tpu.transformers import (
        AutoModelForCausalLM,
        BitsAndBytesConfig,
    )

    cfg = hf.LlamaConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=128,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_hf_model(
        hf.LlamaForCausalLM(cfg),
        quantization_config=BitsAndBytesConfig(load_in_4bit=True),
    )
    ids = (np.arange(8, dtype=np.int32)[None, :] % 120) + 1
    out = model.generate(
        ids, SamplingConfig(do_sample=False, max_new_tokens=4)
    )
    assert out.shape == (1, 4)


def test_metric_drives_quantize_gate():
    """NLPTrainer.quantize(metric=Metric(...)) uses the metric's criterion."""
    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.quantization.config import (
        RtnConfig,
    )
    from intel_extension_for_transformers_tpu.trainer.configs import (
        TrainingArguments,
    )
    from intel_extension_for_transformers_tpu.trainer.trainer import NLPTrainer
    from intel_extension_for_transformers_tpu.transformers.utils.metrics import (
        Metric,
    )

    params = {"dense": {"kernel": jnp.ones((64, 64), jnp.float32)}}
    trainer = NLPTrainer(
        params=params,
        apply_fn=lambda p, ids, mask=None: None,
        args=TrainingArguments(output_dir="/tmp/compat_gate"),
        train_dataset=[],
    )
    qm = trainer.quantize(
        RtnConfig(weight_dtype="int4", group_size=32),
        metric=Metric(name="eval_accuracy", criterion=0.5),
    )
    assert qm is not None
