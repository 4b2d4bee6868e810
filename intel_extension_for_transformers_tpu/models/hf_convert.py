"""HuggingFace checkpoint → JAX params conversion.

The analogue of the reference consuming HF checkpoints in
`from_pretrained` (reference: modeling/modeling_auto.py:363) — but instead of
wrapping torch modules we convert the state dict once into our functional
param trees. torch stays a load-time-only dependency (CPU), never on the
compute path.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.bert import (
    BertConfig,
    bert_config_from_hf,
)
from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_config_from_hf,
)


def _np(t) -> np.ndarray:
    """torch tensor / array-like → numpy (host)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _lin(sd: Mapping, prefix: str) -> dict:
    """HF nn.Linear stores weight (out, in); we store kernel (in, out)."""
    out = {"kernel": jnp.asarray(_np(sd[prefix + ".weight"]).T)}
    if prefix + ".bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[prefix + ".bias"]))
    return out


def bert_params_from_hf(hf_model) -> tuple[dict, BertConfig]:
    """Convert a transformers BertModel (or *ForMaskedLM .bert) to our tree."""
    config = bert_config_from_hf(hf_model.config)
    sd = {k: v for k, v in hf_model.state_dict().items()}
    # allow passing BertForX by stripping the leading "bert." prefix
    if any(k.startswith("bert.") for k in sd):
        sd = {k[len("bert.") :]: v for k, v in sd.items() if k.startswith("bert.")}

    e = "embeddings."
    params: dict[str, Any] = {
        "embeddings": {
            "word_embeddings": jnp.asarray(_np(sd[e + "word_embeddings.weight"])),
            "position_embeddings": jnp.asarray(
                _np(sd[e + "position_embeddings.weight"])
            ),
            "token_type_embeddings": jnp.asarray(
                _np(sd[e + "token_type_embeddings.weight"])
            ),
            "ln_scale": jnp.asarray(_np(sd[e + "LayerNorm.weight"])),
            "ln_bias": jnp.asarray(_np(sd[e + "LayerNorm.bias"])),
        },
        "layers": [],
    }
    for li in range(config.num_hidden_layers):
        p = f"encoder.layer.{li}."
        params["layers"].append(
            {
                "attention": {
                    "query": _lin(sd, p + "attention.self.query"),
                    "key": _lin(sd, p + "attention.self.key"),
                    "value": _lin(sd, p + "attention.self.value"),
                    "output": _lin(sd, p + "attention.output.dense"),
                    "ln_scale": jnp.asarray(
                        _np(sd[p + "attention.output.LayerNorm.weight"])
                    ),
                    "ln_bias": jnp.asarray(
                        _np(sd[p + "attention.output.LayerNorm.bias"])
                    ),
                },
                "mlp": {
                    "intermediate": _lin(sd, p + "intermediate.dense"),
                    "output": _lin(sd, p + "output.dense"),
                    "ln_scale": jnp.asarray(_np(sd[p + "output.LayerNorm.weight"])),
                    "ln_bias": jnp.asarray(_np(sd[p + "output.LayerNorm.bias"])),
                },
            }
        )
    if "pooler.dense.weight" in sd:
        params["pooler"] = _lin(sd, "pooler.dense")
    else:
        h = config.hidden_size
        params["pooler"] = {
            "kernel": jnp.eye(h, dtype=jnp.float32),
            "bias": jnp.zeros((h,), jnp.float32),
        }
    return params, config


def llama_params_from_hf(hf_model) -> tuple[dict, "LlamaConfig"]:
    """Convert a transformers LlamaForCausalLM to our tree."""
    config = llama_config_from_hf(hf_model.config)
    sd = hf_model.state_dict()
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    params: dict[str, Any] = {
        "embed_tokens": jnp.asarray(_np(sd[pre + "embed_tokens.weight"])),
        "layers": [],
        "final_norm": jnp.asarray(_np(sd[pre + "norm.weight"])),
    }
    if "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": jnp.asarray(_np(sd["lm_head.weight"]).T)}
    else:  # tied embeddings
        params["lm_head"] = {"kernel": jnp.asarray(_np(sd[pre + "embed_tokens.weight"]).T)}

    for li in range(config.num_hidden_layers):
        p = f"{pre}layers.{li}."
        params["layers"].append(
            {
                "input_norm": jnp.asarray(_np(sd[p + "input_layernorm.weight"])),
                "attention": {
                    "q": _lin(sd, p + "self_attn.q_proj"),
                    "k": _lin(sd, p + "self_attn.k_proj"),
                    "v": _lin(sd, p + "self_attn.v_proj"),
                    "o": _lin(sd, p + "self_attn.o_proj"),
                },
                "post_norm": jnp.asarray(
                    _np(sd[p + "post_attention_layernorm.weight"])
                ),
                "mlp": {
                    "gate": _lin(sd, p + "mlp.gate_proj"),
                    "up": _lin(sd, p + "mlp.up_proj"),
                    "down": _lin(sd, p + "mlp.down_proj"),
                },
            }
        )
    return params, config
