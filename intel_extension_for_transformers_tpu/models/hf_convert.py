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

    q_rows = config.num_attention_heads * config.head_dim
    kv_rows = config.num_key_value_heads * config.head_dim
    for li in range(config.num_hidden_layers):
        p = f"{pre}layers.{li}."
        if config.num_local_experts > 0:
            # Mixtral MoE block: gate router + stacked expert w1/w3/w2
            moe = p + "block_sparse_moe."
            E = config.num_local_experts
            mlp = {
                "router": {"kernel": jnp.asarray(_np(sd[moe + "gate.weight"]).T)},
                "experts": {
                    "gate": jnp.stack(
                        [jnp.asarray(_np(sd[f"{moe}experts.{j}.w1.weight"]).T)
                         for j in range(E)]
                    ),
                    "up": jnp.stack(
                        [jnp.asarray(_np(sd[f"{moe}experts.{j}.w3.weight"]).T)
                         for j in range(E)]
                    ),
                    "down": jnp.stack(
                        [jnp.asarray(_np(sd[f"{moe}experts.{j}.w2.weight"]).T)
                         for j in range(E)]
                    ),
                },
            }
        elif p + "mlp.gate_up_proj.weight" in sd:
            # Phi-3 fuses [gate; up] into one projection
            # (reference model_type menu "phi3": modeling_auto.py:325-347)
            gu = _np(sd[p + "mlp.gate_up_proj.weight"])  # (2*ffn, H)
            ffn = gu.shape[0] // 2
            mlp = {
                "gate": {"kernel": jnp.asarray(gu[:ffn].T)},
                "up": {"kernel": jnp.asarray(gu[ffn:].T)},
                "down": _lin(sd, p + "mlp.down_proj"),
            }
        else:
            mlp = {
                "gate": _lin(sd, p + "mlp.gate_proj"),
                "up": _lin(sd, p + "mlp.up_proj"),
                "down": _lin(sd, p + "mlp.down_proj"),
            }
        if p + "self_attn.qkv_proj.weight" in sd:
            # Phi-3 fuses [q; k; v] into one projection
            w = _np(sd[p + "self_attn.qkv_proj.weight"])
            attn = {
                "q": {"kernel": jnp.asarray(w[:q_rows].T)},
                "k": {"kernel": jnp.asarray(w[q_rows : q_rows + kv_rows].T)},
                "v": {"kernel": jnp.asarray(w[q_rows + kv_rows :].T)},
                "o": _lin(sd, p + "self_attn.o_proj"),
            }
        else:
            attn = {
                "q": _lin(sd, p + "self_attn.q_proj"),
                "k": _lin(sd, p + "self_attn.k_proj"),
                "v": _lin(sd, p + "self_attn.v_proj"),
                "o": _lin(sd, p + "self_attn.o_proj"),
            }
        params["layers"].append(
            {
                "input_norm": jnp.asarray(_np(sd[p + "input_layernorm.weight"])),
                "attention": attn,
                "post_norm": jnp.asarray(
                    _np(sd[p + "post_attention_layernorm.weight"])
                ),
                "mlp": mlp,
            }
        )
    return params, config


# ---------------------------------------------------------------------------
# Generic decoder families (models/decoder.py)
# (reference: modeling_auto.py:325-347 model_type menu — gptj, gpt_neox, opt,
#  bloom, mpt, falcon, phi, gpt_bigcode — each a distinct torch/neural-speed
#  port there; here one converter per checkpoint layout into the same tree)
# ---------------------------------------------------------------------------


def _norm_p(sd: Mapping, prefix: str) -> dict:
    out = {"scale": jnp.asarray(_np(sd[prefix + ".weight"]))}
    if prefix + ".bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[prefix + ".bias"]))
    return out


def _split_fused_qkv_per_head(w, b, nh, hd):
    """Fused (3·nh·hd, H) with per-head [q,k,v] blocks (GPT-NeoX/BLOOM)."""
    H = w.shape[1]
    w3 = w.reshape(nh, 3, hd, H)
    outs = []
    for j in range(3):
        p = {"kernel": jnp.asarray(w3[:, j].reshape(nh * hd, H).T)}
        if b is not None:
            p["bias"] = jnp.asarray(b.reshape(nh, 3, hd)[:, j].reshape(-1))
        outs.append(p)
    return outs  # [q, k, v]


def decoder_params_from_hf(hf_model):
    """Convert a supported HF causal LM into (params, DecoderConfig)."""
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    hc = hf_model.config
    mt = hc.model_type
    sd = {k: v for k, v in hf_model.state_dict().items()}
    conv = _DECODER_CONVERTERS.get(mt)
    if conv is None:
        raise ValueError(
            f"unsupported model_type {mt!r}; supported: "
            f"{sorted(_DECODER_CONVERTERS)} (+ llama family via "
            "llama_params_from_hf)"
        )
    return conv(hc, sd)


def _act_of(hc, default="gelu_new"):
    a = getattr(hc, "activation_function", getattr(hc, "hidden_act", default))
    return {"gelu": "gelu", "gelu_new": "gelu_new", "gelu_fast": "gelu_new",
            "gelu_pytorch_tanh": "gelu_new", "relu": "relu",
            "silu": "silu"}.get(a, default)


def _convert_gptj(hc, sd):
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    hd = hc.n_embd // hc.n_head
    config = DecoderConfig(
        model_type="gptj",
        vocab_size=hc.vocab_size,
        hidden_size=hc.n_embd,
        num_hidden_layers=hc.n_layer,
        num_attention_heads=hc.n_head,
        num_key_value_heads=hc.n_head,
        intermediate_size=getattr(hc, "n_inner", None) or 4 * hc.n_embd,
        max_position_embeddings=hc.n_positions,
        rotary_pct=hc.rotary_dim / hd,
        rotary_interleaved=True,
        parallel_residual=True,
        shared_ln=True,
        activation=_act_of(hc),
        attention_bias=False,
        mlp_bias=True,
        lm_head_bias="lm_head.bias" in sd,
        norm_eps=hc.layer_norm_epsilon,
    )
    params = {
        "embed_tokens": jnp.asarray(_np(sd["transformer.wte.weight"])),
        "layers": [],
        "final_norm": _norm_p(sd, "transformer.ln_f"),
        "lm_head": _lin(sd, "lm_head"),
    }
    for li in range(config.num_hidden_layers):
        p = f"transformer.h.{li}."
        params["layers"].append(
            {
                "ln1": _norm_p(sd, p + "ln_1"),
                "attention": {
                    "q": _lin(sd, p + "attn.q_proj"),
                    "k": _lin(sd, p + "attn.k_proj"),
                    "v": _lin(sd, p + "attn.v_proj"),
                    "o": _lin(sd, p + "attn.out_proj"),
                },
                "mlp": {
                    "up": _lin(sd, p + "mlp.fc_in"),
                    "down": _lin(sd, p + "mlp.fc_out"),
                },
            }
        )
    return params, config


def _convert_gpt_neox(hc, sd):
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    nh = hc.num_attention_heads
    hd = hc.hidden_size // nh
    config = DecoderConfig(
        model_type="gpt_neox",
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_hidden_layers=hc.num_hidden_layers,
        num_attention_heads=nh,
        num_key_value_heads=nh,
        intermediate_size=hc.intermediate_size,
        max_position_embeddings=hc.max_position_embeddings,
        rotary_pct=hc.rotary_pct,
        rope_theta=getattr(hc, "rotary_emb_base", 10000.0),
        parallel_residual=hc.use_parallel_residual,
        activation=_act_of(hc, "gelu"),
        norm_eps=hc.layer_norm_eps,
    )
    params = {
        "embed_tokens": jnp.asarray(_np(sd["gpt_neox.embed_in.weight"])),
        "layers": [],
        "final_norm": _norm_p(sd, "gpt_neox.final_layer_norm"),
        "lm_head": {"kernel": jnp.asarray(_np(sd["embed_out.weight"]).T)},
    }
    for li in range(config.num_hidden_layers):
        p = f"gpt_neox.layers.{li}."
        w = _np(sd[p + "attention.query_key_value.weight"])
        b = _np(sd[p + "attention.query_key_value.bias"])
        q, k, v = _split_fused_qkv_per_head(w, b, nh, hd)
        params["layers"].append(
            {
                "ln1": _norm_p(sd, p + "input_layernorm"),
                "ln2": _norm_p(sd, p + "post_attention_layernorm"),
                "attention": {"q": q, "k": k, "v": v,
                              "o": _lin(sd, p + "attention.dense")},
                "mlp": {
                    "up": _lin(sd, p + "mlp.dense_h_to_4h"),
                    "down": _lin(sd, p + "mlp.dense_4h_to_h"),
                },
            }
        )
    return params, config


def _convert_opt(hc, sd):
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    config = DecoderConfig(
        model_type="opt",
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_hidden_layers=hc.num_hidden_layers,
        num_attention_heads=hc.num_attention_heads,
        num_key_value_heads=hc.num_attention_heads,
        intermediate_size=hc.ffn_dim,
        max_position_embeddings=hc.max_position_embeddings,
        pos_embedding="learned",
        learned_pos_offset=2,
        activation=_act_of(hc, "relu"),
        tie_word_embeddings=True,
        norm_eps=1e-5,
    )
    pre = "model.decoder."
    params = {
        "embed_tokens": jnp.asarray(_np(sd[pre + "embed_tokens.weight"])),
        "pos_embed": jnp.asarray(_np(sd[pre + "embed_positions.weight"])),
        "layers": [],
        "final_norm": _norm_p(sd, pre + "final_layer_norm"),
        "lm_head": {
            "kernel": jnp.asarray(_np(sd[pre + "embed_tokens.weight"]).T)
        },
    }
    for li in range(config.num_hidden_layers):
        p = f"{pre}layers.{li}."
        params["layers"].append(
            {
                "ln1": _norm_p(sd, p + "self_attn_layer_norm"),
                "ln2": _norm_p(sd, p + "final_layer_norm"),
                "attention": {
                    "q": _lin(sd, p + "self_attn.q_proj"),
                    "k": _lin(sd, p + "self_attn.k_proj"),
                    "v": _lin(sd, p + "self_attn.v_proj"),
                    "o": _lin(sd, p + "self_attn.out_proj"),
                },
                "mlp": {"up": _lin(sd, p + "fc1"), "down": _lin(sd, p + "fc2")},
            }
        )
    return params, config


def _convert_bloom(hc, sd):
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    nh = hc.n_head
    hd = hc.hidden_size // nh
    config = DecoderConfig(
        model_type="bloom",
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_hidden_layers=hc.n_layer,
        num_attention_heads=nh,
        num_key_value_heads=nh,
        intermediate_size=4 * hc.hidden_size,
        max_position_embeddings=4096,
        pos_embedding="alibi",
        embedding_norm=True,
        activation="gelu_new",  # BloomGelu is the tanh approximation
        tie_word_embeddings=True,
        norm_eps=hc.layer_norm_epsilon,
    )
    pre = "transformer."
    params = {
        "embed_tokens": jnp.asarray(_np(sd[pre + "word_embeddings.weight"])),
        "embed_norm": _norm_p(sd, pre + "word_embeddings_layernorm"),
        "layers": [],
        "final_norm": _norm_p(sd, pre + "ln_f"),
        "lm_head": {
            "kernel": jnp.asarray(_np(sd[pre + "word_embeddings.weight"]).T)
        },
    }
    for li in range(config.num_hidden_layers):
        p = f"{pre}h.{li}."
        w = _np(sd[p + "self_attention.query_key_value.weight"])
        b = _np(sd[p + "self_attention.query_key_value.bias"])
        q, k, v = _split_fused_qkv_per_head(w, b, nh, hd)
        params["layers"].append(
            {
                "ln1": _norm_p(sd, p + "input_layernorm"),
                "ln2": _norm_p(sd, p + "post_attention_layernorm"),
                "attention": {"q": q, "k": k, "v": v,
                              "o": _lin(sd, p + "self_attention.dense")},
                "mlp": {
                    "up": _lin(sd, p + "mlp.dense_h_to_4h"),
                    "down": _lin(sd, p + "mlp.dense_4h_to_h"),
                },
            }
        )
    return params, config


def _convert_mpt(hc, sd):
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    H = hc.d_model
    config = DecoderConfig(
        model_type="mpt",
        vocab_size=hc.vocab_size,
        hidden_size=H,
        num_hidden_layers=hc.n_layers,
        num_attention_heads=hc.n_heads,
        num_key_value_heads=hc.n_heads,
        intermediate_size=getattr(hc, "expansion_ratio", 4) * H,
        max_position_embeddings=hc.max_seq_len,
        pos_embedding="alibi",
        activation="gelu",
        attention_bias=False,
        mlp_bias=False,
        tie_word_embeddings=True,
        norm_eps=1e-5,
    )
    pre = "transformer."
    params = {
        "embed_tokens": jnp.asarray(_np(sd[pre + "wte.weight"])),
        "layers": [],
        "final_norm": _norm_p(sd, pre + "norm_f"),
        "lm_head": {"kernel": jnp.asarray(_np(sd[pre + "wte.weight"]).T)},
    }
    for li in range(config.num_hidden_layers):
        p = f"{pre}blocks.{li}."
        w = _np(sd[p + "attn.Wqkv.weight"])  # (3H, H), thirds [Q;K;V]
        q_w, k_w, v_w = np.split(w, 3, axis=0)
        params["layers"].append(
            {
                "ln1": _norm_p(sd, p + "norm_1"),
                "ln2": _norm_p(sd, p + "norm_2"),
                "attention": {
                    "q": {"kernel": jnp.asarray(q_w.T)},
                    "k": {"kernel": jnp.asarray(k_w.T)},
                    "v": {"kernel": jnp.asarray(v_w.T)},
                    "o": _lin(sd, p + "attn.out_proj"),
                },
                "mlp": {
                    "up": _lin(sd, p + "ffn.up_proj"),
                    "down": _lin(sd, p + "ffn.down_proj"),
                },
            }
        )
    return params, config


def _convert_falcon(hc, sd):
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    nh = hc.num_attention_heads
    hd = hc.hidden_size // nh
    multi_query = getattr(hc, "multi_query", True)
    nkv = 1 if multi_query else getattr(hc, "num_kv_heads", nh)
    config = DecoderConfig(
        model_type="falcon",
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_hidden_layers=hc.num_hidden_layers,
        num_attention_heads=nh,
        num_key_value_heads=nkv,
        intermediate_size=4 * hc.hidden_size,
        max_position_embeddings=2048,
        rope_theta=getattr(hc, "rope_theta", 10000.0),
        parallel_residual=getattr(hc, "parallel_attn", True),
        shared_ln=getattr(hc, "parallel_attn", True),
        activation="gelu",
        attention_bias=getattr(hc, "bias", False),
        mlp_bias=getattr(hc, "bias", False),
        tie_word_embeddings=True,
        norm_eps=hc.layer_norm_epsilon,
    )
    pre = "transformer."
    params = {
        "embed_tokens": jnp.asarray(_np(sd[pre + "word_embeddings.weight"])),
        "layers": [],
        "final_norm": _norm_p(sd, pre + "ln_f"),
        "lm_head": {
            "kernel": jnp.asarray(_np(sd[pre + "word_embeddings.weight"]).T)
        },
    }
    for li in range(config.num_hidden_layers):
        p = f"{pre}h.{li}."
        w = _np(sd[p + "self_attention.query_key_value.weight"])
        # falcon-7b fused layout: [q (nh·hd), k (nkv·hd), v (nkv·hd)]
        q_w = w[: nh * hd]
        k_w = w[nh * hd : nh * hd + nkv * hd]
        v_w = w[nh * hd + nkv * hd :]
        params["layers"].append(
            {
                "ln1": _norm_p(sd, p + "input_layernorm"),
                "attention": {
                    "q": {"kernel": jnp.asarray(q_w.T)},
                    "k": {"kernel": jnp.asarray(k_w.T)},
                    "v": {"kernel": jnp.asarray(v_w.T)},
                    "o": _lin(sd, p + "self_attention.dense"),
                },
                "mlp": {
                    "up": _lin(sd, p + "mlp.dense_h_to_4h"),
                    "down": _lin(sd, p + "mlp.dense_4h_to_h"),
                },
            }
        )
    return params, config


def _convert_phi(hc, sd):
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    config = DecoderConfig(
        model_type="phi",
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_hidden_layers=hc.num_hidden_layers,
        num_attention_heads=hc.num_attention_heads,
        num_key_value_heads=getattr(hc, "num_key_value_heads", None)
        or hc.num_attention_heads,
        intermediate_size=hc.intermediate_size,
        max_position_embeddings=hc.max_position_embeddings,
        rotary_pct=getattr(hc, "partial_rotary_factor", 0.5),
        rope_theta=getattr(hc, "rope_theta", 10000.0),
        parallel_residual=True,
        shared_ln=True,
        activation=_act_of(hc, "gelu_new"),
        lm_head_bias=True,
        norm_eps=hc.layer_norm_eps,
    )
    pre = "model."
    params = {
        "embed_tokens": jnp.asarray(_np(sd[pre + "embed_tokens.weight"])),
        "layers": [],
        "final_norm": _norm_p(sd, pre + "final_layernorm"),
        "lm_head": _lin(sd, "lm_head"),
    }
    for li in range(config.num_hidden_layers):
        p = f"{pre}layers.{li}."
        params["layers"].append(
            {
                "ln1": _norm_p(sd, p + "input_layernorm"),
                "attention": {
                    "q": _lin(sd, p + "self_attn.q_proj"),
                    "k": _lin(sd, p + "self_attn.k_proj"),
                    "v": _lin(sd, p + "self_attn.v_proj"),
                    "o": _lin(sd, p + "self_attn.dense"),
                },
                "mlp": {
                    "up": _lin(sd, p + "mlp.fc1"),
                    "down": _lin(sd, p + "mlp.fc2"),
                },
            }
        )
    return params, config


_DECODER_CONVERTERS = {
    "gptj": _convert_gptj,
    "gpt_neox": _convert_gpt_neox,
    "opt": _convert_opt,
    "bloom": _convert_bloom,
    "mpt": _convert_mpt,
    "falcon": _convert_falcon,
    "phi": _convert_phi,
}


def _convert_gpt_bigcode(hc, sd):
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    nh = hc.n_head
    hd = hc.n_embd // nh
    multi_query = getattr(hc, "multi_query", True)
    nkv = 1 if multi_query else nh
    config = DecoderConfig(
        model_type="gpt_bigcode",
        vocab_size=hc.vocab_size,
        hidden_size=hc.n_embd,
        num_hidden_layers=hc.n_layer,
        num_attention_heads=nh,
        num_key_value_heads=nkv,
        intermediate_size=getattr(hc, "n_inner", None) or 4 * hc.n_embd,
        max_position_embeddings=hc.n_positions,
        pos_embedding="learned",
        activation=_act_of(hc, "gelu_new"),
        tie_word_embeddings=True,
        norm_eps=hc.layer_norm_epsilon,
    )
    pre = "transformer."
    params = {
        "embed_tokens": jnp.asarray(_np(sd[pre + "wte.weight"])),
        "pos_embed": jnp.asarray(_np(sd[pre + "wpe.weight"])),
        "layers": [],
        "final_norm": _norm_p(sd, pre + "ln_f"),
        "lm_head": {"kernel": jnp.asarray(_np(sd[pre + "wte.weight"]).T)},
    }
    H = hc.n_embd
    for li in range(config.num_hidden_layers):
        p = f"{pre}h.{li}."
        w = _np(sd[p + "attn.c_attn.weight"])  # rows: [q (H), k (hd·nkv), v]
        b = _np(sd[p + "attn.c_attn.bias"])
        q_w, k_w, v_w = w[:H], w[H : H + nkv * hd], w[H + nkv * hd :]
        q_b, k_b, v_b = b[:H], b[H : H + nkv * hd], b[H + nkv * hd :]
        params["layers"].append(
            {
                "ln1": _norm_p(sd, p + "ln_1"),
                "ln2": _norm_p(sd, p + "ln_2"),
                "attention": {
                    "q": {"kernel": jnp.asarray(q_w.T), "bias": jnp.asarray(q_b)},
                    "k": {"kernel": jnp.asarray(k_w.T), "bias": jnp.asarray(k_b)},
                    "v": {"kernel": jnp.asarray(v_w.T), "bias": jnp.asarray(v_b)},
                    "o": _lin(sd, p + "attn.c_proj"),
                },
                "mlp": {
                    "up": _lin(sd, p + "mlp.c_fc"),
                    "down": _lin(sd, p + "mlp.c_proj"),
                },
            }
        )
    return params, config


_DECODER_CONVERTERS["gpt_bigcode"] = _convert_gpt_bigcode


def _convert_stablelm(hc, sd):
    """StableLM (reference model_type menu: modeling_auto.py:325-347).

    Llama-shaped weights with LayerNorm (biased) norms, PARTIAL rotary
    (partial_rotary_factor, half-split convention), gated silu MLP, and
    optional qkv biases / parallel residual."""
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    if getattr(hc, "qk_layernorm", False):
        raise ValueError("stablelm qk_layernorm variant not supported")
    config = DecoderConfig(
        model_type="stablelm",
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_hidden_layers=hc.num_hidden_layers,
        num_attention_heads=hc.num_attention_heads,
        num_key_value_heads=hc.num_key_value_heads,
        intermediate_size=hc.intermediate_size,
        max_position_embeddings=hc.max_position_embeddings,
        rotary_pct=getattr(hc, "partial_rotary_factor", 0.25),
        rotary_interleaved=False,
        rope_theta=getattr(hc, "rope_theta", 10000.0),
        parallel_residual=getattr(hc, "use_parallel_residual", False),
        # the parallel block drops post_attention_layernorm: ONE shared ln
        shared_ln=getattr(hc, "use_parallel_residual", False),
        norm_type="layernorm",
        norm_eps=hc.layer_norm_eps,
        activation=_act_of(hc, "silu"),
        gated_mlp=True,
        attention_bias=getattr(hc, "use_qkv_bias", False),
        mlp_bias=False,
        tie_word_embeddings=getattr(hc, "tie_word_embeddings", False),
    )
    params = {
        "embed_tokens": jnp.asarray(_np(sd["model.embed_tokens.weight"])),
        "layers": [],
        "final_norm": _norm_p(sd, "model.norm"),
    }
    if config.tie_word_embeddings:
        params["lm_head"] = {
            "kernel": jnp.asarray(_np(sd["model.embed_tokens.weight"]).T)
        }
    else:
        params["lm_head"] = _lin(sd, "lm_head")
    for li in range(config.num_hidden_layers):
        p = f"model.layers.{li}."
        layer = {
            "ln1": _norm_p(sd, p + "input_layernorm"),
            "attention": {
                "q": _lin(sd, p + "self_attn.q_proj"),
                "k": _lin(sd, p + "self_attn.k_proj"),
                "v": _lin(sd, p + "self_attn.v_proj"),
                "o": _lin(sd, p + "self_attn.o_proj"),
            },
            "mlp": {
                "gate": _lin(sd, p + "mlp.gate_proj"),
                "up": _lin(sd, p + "mlp.up_proj"),
                "down": _lin(sd, p + "mlp.down_proj"),
            },
        }
        if not config.shared_ln:
            layer["ln2"] = _norm_p(sd, p + "post_attention_layernorm")
        params["layers"].append(layer)
    return params, config


_DECODER_CONVERTERS["stablelm"] = _convert_stablelm


def _convert_chatglm(hc, sd):
    """ChatGLM2/3 (reference model_type menu: modeling_auto.py:325-347;
    neural-speed chatglm graph).

    RMSNorm, grouped-KV fused QKV with biases, rotary on the first HALF of
    head_dim in the GPT-J interleaved convention, SwiGLU MLP stored as one
    fused dense_h_to_4h = [gate; up]."""
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    nh = hc.num_attention_heads
    hd = getattr(hc, "kv_channels", hc.hidden_size // nh)
    nkv = (
        hc.multi_query_group_num
        if getattr(hc, "multi_query_attention", False)
        else nh
    )
    rope_ratio = getattr(hc, "rope_ratio", 1.0)
    config = DecoderConfig(
        model_type="chatglm",
        vocab_size=getattr(hc, "padded_vocab_size", None) or hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_hidden_layers=hc.num_layers,
        num_attention_heads=nh,
        num_key_value_heads=nkv,
        intermediate_size=hc.ffn_hidden_size,
        max_position_embeddings=getattr(hc, "seq_length", 2048),
        rotary_pct=0.5,
        rotary_interleaved=True,
        rope_theta=10000.0 * rope_ratio,
        norm_type="rmsnorm" if getattr(hc, "rmsnorm", True) else "layernorm",
        norm_eps=hc.layernorm_epsilon,
        activation="silu",
        gated_mlp=True,
        attention_bias=getattr(hc, "add_qkv_bias", True),
        mlp_bias=False,
        tie_word_embeddings=False,
    )
    pre = "transformer."
    params = {
        "embed_tokens": jnp.asarray(
            _np(sd[pre + "embedding.word_embeddings.weight"])
        ),
        "layers": [],
        "final_norm": _norm_p(sd, pre + "encoder.final_layernorm"),
        "lm_head": _lin(sd, pre + "output_layer"),
    }
    q_rows, kv_rows = nh * hd, nkv * hd
    ffn = hc.ffn_hidden_size
    for li in range(config.num_hidden_layers):
        p = f"{pre}encoder.layers.{li}."
        w = _np(sd[p + "self_attention.query_key_value.weight"])
        attn = {}
        splits = {"q": (0, q_rows), "k": (q_rows, q_rows + kv_rows),
                  "v": (q_rows + kv_rows, q_rows + 2 * kv_rows)}
        has_bias = p + "self_attention.query_key_value.bias" in sd
        b = _np(sd[p + "self_attention.query_key_value.bias"]) if has_bias else None
        for name, (a, z) in splits.items():
            attn[name] = {"kernel": jnp.asarray(w[a:z].T)}
            if b is not None:
                attn[name]["bias"] = jnp.asarray(b[a:z])
        attn["o"] = _lin(sd, p + "self_attention.dense")
        h4 = _np(sd[p + "mlp.dense_h_to_4h.weight"])  # (2*ffn, H): [gate; up]
        params["layers"].append(
            {
                "ln1": _norm_p(sd, p + "input_layernorm"),
                "ln2": _norm_p(sd, p + "post_attention_layernorm"),
                "attention": attn,
                "mlp": {
                    "gate": {"kernel": jnp.asarray(h4[:ffn].T)},
                    "up": {"kernel": jnp.asarray(h4[ffn:].T)},
                    "down": _lin(sd, p + "mlp.dense_4h_to_h"),
                },
            }
        )
    return params, config


_DECODER_CONVERTERS["chatglm"] = _convert_chatglm


def _convert_gemma(hc, sd):
    """Gemma (beyond the reference's Oct-2024 menu — llama-shaped weights
    with rmsnorm-(1+w), sqrt(hidden)-scaled embeddings, gelu-tanh gated MLP,
    an explicit head_dim, and tied embeddings)."""
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    config = DecoderConfig(
        model_type="gemma",
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_hidden_layers=hc.num_hidden_layers,
        num_attention_heads=hc.num_attention_heads,
        num_key_value_heads=hc.num_key_value_heads,
        intermediate_size=hc.intermediate_size,
        max_position_embeddings=hc.max_position_embeddings,
        rotary_interleaved=False,
        rope_theta=getattr(hc, "rope_theta", 10000.0),
        norm_type="rmsnorm_1p",
        norm_eps=hc.rms_norm_eps,
        activation=_act_of(hc, "gelu_new"),
        gated_mlp=True,
        attention_bias=getattr(hc, "attention_bias", False),
        mlp_bias=False,
        tie_word_embeddings=True,
        head_dim_override=getattr(hc, "head_dim", None),
        embed_scale=True,
    )
    embed = _np(sd["model.embed_tokens.weight"])
    params = {
        "embed_tokens": jnp.asarray(embed),
        "layers": [],
        "final_norm": _norm_p(sd, "model.norm"),
        "lm_head": {
            "kernel": jnp.asarray(
                _np(sd["lm_head.weight"]).T if "lm_head.weight" in sd
                else embed.T
            )
        },
    }
    for li in range(config.num_hidden_layers):
        p = f"model.layers.{li}."
        params["layers"].append(
            {
                "ln1": _norm_p(sd, p + "input_layernorm"),
                "attention": {
                    "q": _lin(sd, p + "self_attn.q_proj"),
                    "k": _lin(sd, p + "self_attn.k_proj"),
                    "v": _lin(sd, p + "self_attn.v_proj"),
                    "o": _lin(sd, p + "self_attn.o_proj"),
                },
                "ln2": _norm_p(sd, p + "post_attention_layernorm"),
                "mlp": {
                    "gate": _lin(sd, p + "mlp.gate_proj"),
                    "up": _lin(sd, p + "mlp.up_proj"),
                    "down": _lin(sd, p + "mlp.down_proj"),
                },
            }
        )
    return params, config


_DECODER_CONVERTERS["gemma"] = _convert_gemma


def _convert_baichuan(hc, sd):
    """Baichuan 7B/13B (reference model_type menu "baichuan":
    modeling_auto.py:325-347; neural-speed baichuan graph).

    Llama-style blocks (RMSNorm, SwiGLU, no biases) with QKV fused into one
    W_pack projection of [q; k; v] rows. 7B rotates the full head_dim
    (half-split convention); 13B uses ALiBi instead of RoPE — detected from
    `position_embedding` when the checkpoint config carries it, else by the
    13B geometry (hidden_size ≥ 5120)."""
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    pos = str(getattr(hc, "position_embedding", "")).lower()
    if pos not in ("rope", "alibi"):
        pos = "alibi" if hc.hidden_size >= 5120 else "rope"
    config = DecoderConfig(
        model_type="baichuan",
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_hidden_layers=hc.num_hidden_layers,
        num_attention_heads=hc.num_attention_heads,
        num_key_value_heads=hc.num_attention_heads,
        intermediate_size=hc.intermediate_size,
        max_position_embeddings=getattr(
            hc, "max_position_embeddings", getattr(hc, "model_max_length", 4096)
        ),
        pos_embedding=pos,
        rotary_pct=1.0,
        rotary_interleaved=False,
        rope_theta=getattr(hc, "rope_theta", 10000.0),
        norm_type="rmsnorm",
        norm_eps=hc.rms_norm_eps,
        activation="silu",
        gated_mlp=True,
        attention_bias=False,
        mlp_bias=False,
        tie_word_embeddings=False,
    )
    pre = "model." if any(k.startswith("model.") for k in sd) else ""
    params = {
        "embed_tokens": jnp.asarray(_np(sd[pre + "embed_tokens.weight"])),
        "layers": [],
        "final_norm": {"scale": jnp.asarray(_np(sd[pre + "norm.weight"]))},
        "lm_head": _lin(sd, "lm_head"),
    }
    H = hc.hidden_size
    for li in range(config.num_hidden_layers):
        p = f"{pre}layers.{li}."
        w = _np(sd[p + "self_attn.W_pack.weight"])  # (3H, H): [q; k; v]
        params["layers"].append(
            {
                "ln1": _norm_p(sd, p + "input_layernorm"),
                "ln2": _norm_p(sd, p + "post_attention_layernorm"),
                "attention": {
                    "q": {"kernel": jnp.asarray(w[:H].T)},
                    "k": {"kernel": jnp.asarray(w[H : 2 * H].T)},
                    "v": {"kernel": jnp.asarray(w[2 * H :].T)},
                    "o": _lin(sd, p + "self_attn.o_proj"),
                },
                "mlp": {
                    "gate": _lin(sd, p + "mlp.gate_proj"),
                    "up": _lin(sd, p + "mlp.up_proj"),
                    "down": _lin(sd, p + "mlp.down_proj"),
                },
            }
        )
    return params, config


_DECODER_CONVERTERS["baichuan"] = _convert_baichuan


def _convert_qwen(hc, sd):
    """Qwen v1 (reference model_type menu "qwen": modeling_auto.py:325-347;
    neural-speed qwen graph).

    GPT-style naming (transformer.h.N) over a llama-style block: RMSNorm
    ln_1/ln_2, fused biased c_attn = [q; k; v], SwiGLU with gate stored as
    mlp.w2 and up as mlp.w1 (Qwen computes silu(w2(x)) * w1(x)), full-head
    half-split rotary. `intermediate_size` in Qwen configs is 2× the actual
    FFN width, so the width is read off the weights instead."""
    from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig

    ffn = _np(sd["transformer.h.0.mlp.w1.weight"]).shape[0]
    config = DecoderConfig(
        model_type="qwen",
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_hidden_layers=hc.num_hidden_layers,
        num_attention_heads=hc.num_attention_heads,
        num_key_value_heads=hc.num_attention_heads,
        intermediate_size=ffn,
        max_position_embeddings=getattr(hc, "seq_length", 2048),
        pos_embedding="rope",
        rotary_pct=1.0,
        rotary_interleaved=False,
        rope_theta=getattr(hc, "rotary_emb_base", 10000.0),
        norm_type="rmsnorm",
        norm_eps=getattr(hc, "layer_norm_epsilon", 1e-6),
        activation="silu",
        gated_mlp=True,
        attention_bias=True,
        mlp_bias=False,
        tie_word_embeddings=False,
    )
    H = hc.hidden_size
    params = {
        "embed_tokens": jnp.asarray(_np(sd["transformer.wte.weight"])),
        "layers": [],
        "final_norm": _norm_p(sd, "transformer.ln_f"),
        "lm_head": _lin(sd, "lm_head"),
    }
    for li in range(config.num_hidden_layers):
        p = f"transformer.h.{li}."
        w = _np(sd[p + "attn.c_attn.weight"])  # (3H, H): [q; k; v]
        b = _np(sd[p + "attn.c_attn.bias"]) if p + "attn.c_attn.bias" in sd else None
        attn = {}
        for name, j in (("q", 0), ("k", 1), ("v", 2)):
            attn[name] = {"kernel": jnp.asarray(w[j * H : (j + 1) * H].T)}
            if b is not None:
                attn[name]["bias"] = jnp.asarray(b[j * H : (j + 1) * H])
        attn["o"] = _lin(sd, p + "attn.c_proj")
        params["layers"].append(
            {
                "ln1": _norm_p(sd, p + "ln_1"),
                "ln2": _norm_p(sd, p + "ln_2"),
                "attention": attn,
                "mlp": {
                    "gate": _lin(sd, p + "mlp.w2"),
                    "up": _lin(sd, p + "mlp.w1"),
                    "down": _lin(sd, p + "mlp.c_proj"),
                },
            }
        )
    return params, config


_DECODER_CONVERTERS["qwen"] = _convert_qwen

# Reference model_type menu aliases (modeling_auto.py:325-347): checkpoints
# published under these names are architecture-identical to a family above.
_DECODER_ALIASES = {
    "dolly": "gpt_neox",  # databricks/dolly-v2-* are GPT-NeoX finetunes
    "polyglot": "gpt_neox",  # EleutherAI/polyglot-ko-*
    "chatglm2": "chatglm",
    "chatglm3": "chatglm",
    "starcoder": "gpt_bigcode",
}
for _alias, _canon in _DECODER_ALIASES.items():
    _DECODER_CONVERTERS.setdefault(_alias, _DECODER_CONVERTERS[_canon])
