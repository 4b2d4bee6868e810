"""Multi-architecture decoder parity tests: our generic decoder must match
the HF torch forward logits on tiny random-init models of each family
(the conversion+arch-flag correctness oracle; reference coverage:
modeling_auto.py:325-347 model_type list)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers as hf  # noqa: E402

from intel_extension_for_transformers_tpu.models.decoder import (  # noqa: E402
    DecoderConfig,
    decoder_apply,
    decoder_init_params,
)
from intel_extension_for_transformers_tpu.models.hf_convert import (  # noqa: E402
    decoder_params_from_hf,
)
from intel_extension_for_transformers_tpu.models.llama import (  # noqa: E402
    init_kv_cache,
)


def _parity(hf_model, rtol=2e-2, atol=2e-2, T=12):
    hf_model.eval()
    params, config = decoder_params_from_hf(hf_model)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, config.vocab_size, (2, T)).astype(np.int64)
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.float().numpy()
    got, _ = decoder_apply(params, config, jnp.asarray(ids, jnp.int32))
    got = np.asarray(got, np.float32)
    # compare log-softmax (stable under per-position logit offsets)
    ref_l = ref - ref.max(-1, keepdims=True)
    got_l = got - got.max(-1, keepdims=True)
    err = np.abs(ref_l - got_l).max()
    assert err < 0.05, f"{config.model_type}: max logit err {err}"
    return params, config


def test_gptj_parity():
    cfg = hf.GPTJConfig(
        vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        rotary_dim=8, activation_function="gelu_new",
    )
    torch.manual_seed(0)
    _parity(hf.GPTJForCausalLM(cfg))


def test_gpt_neox_parity():
    cfg = hf.GPTNeoXConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, rotary_pct=0.25,
        use_parallel_residual=True,
    )
    torch.manual_seed(0)
    _parity(hf.GPTNeoXForCausalLM(cfg))


def test_gpt_neox_sequential_parity():
    cfg = hf.GPTNeoXConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, rotary_pct=1.0,
        use_parallel_residual=False,
    )
    torch.manual_seed(1)
    _parity(hf.GPTNeoXForCausalLM(cfg))


def test_opt_parity():
    cfg = hf.OPTConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=128, max_position_embeddings=64,
        do_layer_norm_before=True, activation_function="relu",
        word_embed_proj_dim=64,
    )
    torch.manual_seed(0)
    _parity(hf.OPTForCausalLM(cfg))


def test_bloom_parity():
    cfg = hf.BloomConfig(
        vocab_size=128, hidden_size=64, n_layer=2, n_head=4,
    )
    torch.manual_seed(0)
    _parity(hf.BloomForCausalLM(cfg))


def test_mpt_parity():
    cfg = hf.MptConfig(
        vocab_size=128, d_model=64, n_layers=2, n_heads=4, max_seq_len=64,
    )
    torch.manual_seed(0)
    _parity(hf.MptForCausalLM(cfg))


def test_falcon_parity():
    cfg = hf.FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False,
    )
    torch.manual_seed(0)
    _parity(hf.FalconForCausalLM(cfg))


def test_phi_parity():
    cfg = hf.PhiConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, partial_rotary_factor=0.5,
    )
    torch.manual_seed(0)
    _parity(hf.PhiForCausalLM(cfg))


# -------------------------------------------------- generation integration


def test_gemma_parity():
    """Gemma (beyond the reference's menu): rmsnorm(1+w), sqrt(H)-scaled
    embeddings, gelu-tanh gated MLP, EXPLICIT head_dim ≠ hidden/heads."""
    cfg = hf.GemmaConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=64,
        head_dim=32, hidden_activation="gelu_pytorch_tanh",
    )
    torch.manual_seed(5)
    params, config = _parity(hf.GemmaForCausalLM(cfg))
    assert config.head_dim == 32  # the override is live


def test_decoder_generates_and_caches():
    """Cached decode == uncached forward for the generic decoder."""
    config = DecoderConfig.tiny(pos_embedding="alibi", attention_bias=False)
    import jax

    params = decoder_init_params(jax.random.PRNGKey(0), config)
    ids = jnp.asarray(np.arange(10, dtype=np.int32)[None, :] % 512)
    full, _ = decoder_apply(params, config, ids)
    cache = init_kv_cache(config, 1, 16)
    logits_p, cache = decoder_apply(params, config, ids[:, :9], cache)
    logits_d, cache = decoder_apply(params, config, ids[:, 9:], cache)
    np.testing.assert_allclose(
        np.asarray(full[:, -1]), np.asarray(logits_d[:, -1]), rtol=1e-3, atol=1e-3
    )


def test_generate_with_generic_decoder():
    from intel_extension_for_transformers_tpu.models.generation import (
        SamplingConfig,
        generate,
    )
    import jax

    config = DecoderConfig.tiny(rotary_pct=0.5, parallel_residual=True,
                                shared_ln=True)
    params = decoder_init_params(jax.random.PRNGKey(0), config)
    out = generate(
        params, config, np.arange(6, dtype=np.int32) % 512,
        SamplingConfig(max_new_tokens=5, do_sample=False, temperature=0.0,
                       repetition_penalty=1.0),
    )
    assert out.shape == (1, 5)


def test_quantize_generic_decoder():
    from intel_extension_for_transformers_tpu.quantization import (
        RtnConfig,
        quantize_model,
    )
    import jax

    config = DecoderConfig.tiny()
    params = decoder_init_params(jax.random.PRNGKey(0), config)
    ids = jnp.asarray(np.arange(8, dtype=np.int32)[None, :])
    ref, _ = decoder_apply(params, config, ids)
    # int8: tight; int4 on random gaussian weights is ~0.10-0.12 per matmul
    for dtype, tol in [("int8", 0.02), ("int4", 0.3)]:
        qp = quantize_model(params, RtnConfig(weight_dtype=dtype, group_size=32))
        assert qp.quantized_paths
        got, _ = decoder_apply(qp.params, config, ids)
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < tol, (dtype, rel)


def test_auto_model_generic_family_roundtrip(tmp_path):
    """AutoModelForCausalLM handles a GPT-J family model end-to-end:
    convert → quantize → save_low_bit → reload → identical logits."""
    from intel_extension_for_transformers_tpu import (
        AutoModelForCausalLM,
        OptimizedModel,
        RtnConfig,
    )

    cfg = hf.GPTJConfig(
        vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        rotary_dim=8,
    )
    torch.manual_seed(0)
    m = AutoModelForCausalLM.from_hf_model(
        hf.GPTJForCausalLM(cfg),
        quantization_config=RtnConfig(weight_dtype="int8", group_size=32),
    )
    assert m.model_type == "gptj"
    ids = np.arange(10, dtype=np.int32)[None, :] % 128
    a, _ = m(ids)
    d = str(tmp_path / "gptj")
    m.save_low_bit(d)
    r = OptimizedModel.from_pretrained(d)
    assert r.config.model_type == "gptj"
    b, _ = r(ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gpt_bigcode_parity():
    cfg = hf.GPTBigCodeConfig(
        vocab_size=128, n_embd=64, n_head=4, n_layer=2, n_positions=64,
        multi_query=True,
    )
    torch.manual_seed(0)
    _parity(hf.GPTBigCodeForCausalLM(cfg))


def _llama_family_parity(hf_model):
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        llama_params_from_hf,
    )
    from intel_extension_for_transformers_tpu.models.llama import llama_apply

    hf_model.eval()
    params, config = llama_params_from_hf(hf_model)
    ids = np.random.default_rng(0).integers(0, config.vocab_size, (2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(
        llama_apply(params, config, jnp.asarray(ids, jnp.int32))[0], np.float32
    )
    err = np.abs(
        (ref - ref.max(-1, keepdims=True)) - (got - got.max(-1, keepdims=True))
    ).max()
    assert err < 0.05, err


def test_mistral_parity():
    cfg = hf.MistralConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=64, sliding_window=None,
    )
    torch.manual_seed(0)
    _llama_family_parity(hf.MistralForCausalLM(cfg))


def test_qwen2_parity():
    """Qwen2 = llama arch + QKV biases — pins the bias path."""
    cfg = hf.Qwen2Config(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    _llama_family_parity(hf.Qwen2ForCausalLM(cfg))


def test_stablelm_parity():
    cfg = hf.StableLmConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=64, partial_rotary_factor=0.25,
        use_qkv_bias=True, use_parallel_residual=False, hidden_act="silu",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    _parity(hf.StableLmForCausalLM(cfg))


def test_stablelm_parallel_residual_parity():
    cfg = hf.StableLmConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=128,
        max_position_embeddings=64, partial_rotary_factor=0.5,
        use_qkv_bias=False, use_parallel_residual=True,
    )
    torch.manual_seed(1)
    _parity(hf.StableLmForCausalLM(cfg))


# --------------------------- chatglm2/3 oracle ---------------------------
# ChatGLM ships as remote code (no offline HF class), so the parity oracle
# is a minimal local torch implementation of the published ChatGLM2 forward
# semantics: RMSNorm → fused grouped-KV QKV (bias) → interleaved RoPE on the
# first half of head_dim → causal attention → dense; RMSNorm → SwiGLU with
# fused [gate; up] h_to_4h → 4h_to_h (reference menu: modeling_auto.py:325).


class _GlmOracle(torch.nn.Module):
    def __init__(self, V, H, L, nh, nkv, ffn, hd):
        super().__init__()
        self.V, self.H, self.L = V, H, L
        self.nh, self.nkv, self.ffn, self.hd = nh, nkv, ffn, hd
        mk = torch.nn.Linear
        self.emb = torch.nn.Embedding(V, H)
        self.layers = torch.nn.ModuleList()
        for _ in range(L):
            blk = torch.nn.Module()
            blk.ln1_w = torch.nn.Parameter(torch.rand(H) * 0.5 + 0.75)
            blk.qkv = mk(H, (nh + 2 * nkv) * hd, bias=True)
            blk.dense = mk(nh * hd, H, bias=False)
            blk.ln2_w = torch.nn.Parameter(torch.rand(H) * 0.5 + 0.75)
            blk.h4 = mk(H, 2 * ffn, bias=False)
            blk.h4o = mk(ffn, H, bias=False)
            self.layers.append(blk)
        self.lnf_w = torch.nn.Parameter(torch.rand(H) * 0.5 + 0.75)
        self.out = mk(H, V, bias=False)

    @staticmethod
    def _rms(x, w, eps=1e-5):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps)
        return v * w

    def _rope(self, x, positions):
        # interleaved pairs over the FIRST half of head_dim
        B, T, nh, hd = x.shape
        rot = hd // 2
        xr, xp = x[..., :rot], x[..., rot:]
        half = rot // 2
        theta = 1.0 / (10000.0 ** (torch.arange(0, half).float() * 2 / rot))
        ang = positions[:, None].float() * theta[None, :]  # (T, half)
        cos, sin = torch.cos(ang), torch.sin(ang)
        xr = xr.reshape(B, T, nh, half, 2)
        x0, x1 = xr[..., 0], xr[..., 1]
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
        rot0 = x0 * c - x1 * s
        rot1 = x1 * c + x0 * s
        xr = torch.stack([rot0, rot1], dim=-1).reshape(B, T, nh, rot)
        return torch.cat([xr, xp], dim=-1)

    def forward(self, ids):
        B, T = ids.shape
        h = self.emb(ids)
        pos = torch.arange(T)
        for blk in self.layers:
            x = self._rms(h, blk.ln1_w)
            qkv = blk.qkv(x)
            q, k, v = torch.split(
                qkv,
                [self.nh * self.hd, self.nkv * self.hd, self.nkv * self.hd],
                dim=-1,
            )
            q = q.view(B, T, self.nh, self.hd)
            k = k.view(B, T, self.nkv, self.hd)
            v = v.view(B, T, self.nkv, self.hd)
            q, k = self._rope(q, pos), self._rope(k, pos)
            rep = self.nh // self.nkv
            k = k.repeat_interleave(rep, dim=2)
            v = v.repeat_interleave(rep, dim=2)
            att = torch.einsum("bqhd,bkhd->bhqk", q, k) / (self.hd ** 0.5)
            mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
            att = att.masked_fill(~mask, float("-inf")).softmax(-1)
            ctx = torch.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, T, -1)
            h = h + blk.dense(ctx)
            x = self._rms(h, blk.ln2_w)
            g, u = torch.split(blk.h4(x), [self.ffn, self.ffn], dim=-1)
            h = h + blk.h4o(torch.nn.functional.silu(g) * u)
        return self._rms(h, self.lnf_w) @ self.out.weight.T

    # expose the published chatglm2 checkpoint naming for the converter
    def state_dict_chatglm(self):
        sd = {"transformer.embedding.word_embeddings.weight": self.emb.weight}
        for i, blk in enumerate(self.layers):
            p = f"transformer.encoder.layers.{i}."
            sd[p + "input_layernorm.weight"] = blk.ln1_w
            sd[p + "self_attention.query_key_value.weight"] = blk.qkv.weight
            sd[p + "self_attention.query_key_value.bias"] = blk.qkv.bias
            sd[p + "self_attention.dense.weight"] = blk.dense.weight
            sd[p + "post_attention_layernorm.weight"] = blk.ln2_w
            sd[p + "mlp.dense_h_to_4h.weight"] = blk.h4.weight
            sd[p + "mlp.dense_4h_to_h.weight"] = blk.h4o.weight
        sd["transformer.encoder.final_layernorm.weight"] = self.lnf_w
        sd["transformer.output_layer.weight"] = self.out.weight
        return sd


def test_chatglm_parity():
    from types import SimpleNamespace

    torch.manual_seed(0)
    V, H, L, nh, nkv, ffn = 128, 64, 2, 4, 2, 96
    hd = H // nh
    oracle = _GlmOracle(V, H, L, nh, nkv, ffn, hd).eval()
    hc = SimpleNamespace(
        model_type="chatglm", padded_vocab_size=V, vocab_size=V,
        hidden_size=H, num_layers=L, num_attention_heads=nh,
        multi_query_attention=True, multi_query_group_num=nkv,
        kv_channels=hd, ffn_hidden_size=ffn, seq_length=64,
        layernorm_epsilon=1e-5, rmsnorm=True, add_qkv_bias=True,
    )
    fake = SimpleNamespace(
        config=hc, state_dict=oracle.state_dict_chatglm, eval=lambda: None
    )
    params, config = decoder_params_from_hf(fake)
    assert config.model_type == "chatglm" and config.num_key_value_heads == nkv
    rng = np.random.default_rng(0)
    ids = rng.integers(0, V, (2, 12)).astype(np.int64)
    with torch.no_grad():
        ref = oracle(torch.tensor(ids)).float().numpy()
    got, _ = decoder_apply(params, config, jnp.asarray(ids, jnp.int32))
    got = np.asarray(got, np.float32)
    ref_l = ref - ref.max(-1, keepdims=True)
    got_l = got - got.max(-1, keepdims=True)
    err = np.abs(ref_l - got_l).max()
    assert err < 0.05, f"chatglm: max logit err {err}"


# ----------------- phi3 / baichuan / qwen1 (reference menu) -----------------
# These close the last gaps against the reference's supported model_type list
# (modeling_auto.py:325-347): phi3 has a local HF oracle; baichuan and qwen
# ship as remote code, so their oracles are HF llama/qwen2 models whose
# weights are re-laid-out into the baichuan/qwen checkpoint naming — exact
# logits parity then pins both the architecture flags and the fused-weight
# splits.


def test_phi3_parity():
    """Phi-3 = llama arch with fused qkv_proj / gate_up_proj."""
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        llama_params_from_hf,
    )

    cfg = hf.Phi3Config(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=64, pad_token_id=0,
    )
    torch.manual_seed(0)
    model = hf.Phi3ForCausalLM(cfg)
    params, config = llama_params_from_hf(model)
    # the fused [q; k; v] rows must land in the right split
    l0 = model.model.layers[0].self_attn.qkv_proj.weight.detach().numpy()
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["attention"]["q"]["kernel"]),
        l0[:64].T, rtol=1e-6, atol=1e-6,
    )
    from tests.test_decoder_families import _llama_family_parity  # self-import ok

    _llama_family_parity(model)


def _fake(hc, sd):
    from types import SimpleNamespace

    return SimpleNamespace(config=hc, state_dict=lambda: sd, eval=lambda: None)


def test_baichuan7b_parity():
    """Baichuan-7B layout (fused W_pack, RoPE) vs an HF llama oracle whose
    state dict is re-laid-out into baichuan naming."""
    from types import SimpleNamespace

    cfg = hf.LlamaConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=128,
        max_position_embeddings=64, attention_bias=False, mlp_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    oracle = hf.LlamaForCausalLM(cfg).eval()
    osd = oracle.state_dict()
    sd = {}
    for li in range(2):
        p = f"model.layers.{li}."
        sd[p + "self_attn.W_pack.weight"] = torch.cat(
            [osd[p + f"self_attn.{n}_proj.weight"] for n in ("q", "k", "v")], 0
        )
        for n in ("self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj",
                  "mlp.down_proj", "input_layernorm",
                  "post_attention_layernorm"):
            sd[p + n + ".weight"] = osd[p + n + ".weight"]
    sd["model.embed_tokens.weight"] = osd["model.embed_tokens.weight"]
    sd["model.norm.weight"] = osd["model.norm.weight"]
    sd["lm_head.weight"] = osd["lm_head.weight"]
    hc = SimpleNamespace(
        model_type="baichuan", vocab_size=128, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, rms_norm_eps=cfg.rms_norm_eps,
    )
    params, config = decoder_params_from_hf(_fake(hc, sd))
    assert config.model_type == "baichuan" and config.pos_embedding == "rope"
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 12)).astype(np.int64)
    with torch.no_grad():
        ref = oracle(torch.tensor(ids)).logits.float().numpy()
    got, _ = decoder_apply(params, config, jnp.asarray(ids, jnp.int32))
    got = np.asarray(got, np.float32)
    err = np.abs(
        (ref - ref.max(-1, keepdims=True)) - (got - got.max(-1, keepdims=True))
    ).max()
    assert err < 0.05, f"baichuan: max logit err {err}"


def test_baichuan13b_alibi_decode_consistency():
    """13B-geometry baichuan checkpoints switch to ALiBi: converter picks it
    up and cached decode matches the full forward."""
    from types import SimpleNamespace

    torch.manual_seed(0)
    H, L, nh = 64, 2, 4
    sd = {"model.embed_tokens.weight": torch.randn(128, H) * 0.02,
          "model.norm.weight": torch.ones(H),
          "lm_head.weight": torch.randn(128, H) * 0.02}
    for li in range(L):
        p = f"model.layers.{li}."
        sd[p + "self_attn.W_pack.weight"] = torch.randn(3 * H, H) * 0.02
        sd[p + "self_attn.o_proj.weight"] = torch.randn(H, H) * 0.02
        for n in ("gate", "up"):
            sd[p + f"mlp.{n}_proj.weight"] = torch.randn(96, H) * 0.02
        sd[p + "mlp.down_proj.weight"] = torch.randn(H, 96) * 0.02
        sd[p + "input_layernorm.weight"] = torch.ones(H)
        sd[p + "post_attention_layernorm.weight"] = torch.ones(H)
    hc = SimpleNamespace(
        model_type="baichuan", vocab_size=128, hidden_size=5120,
        num_hidden_layers=L, num_attention_heads=nh, intermediate_size=96,
        model_max_length=64, rms_norm_eps=1e-6,
    )
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        _convert_baichuan,
    )

    # geometry probe only for the position-embedding choice
    assert _convert_baichuan(hc, sd)[1].pos_embedding == "alibi"
    hc.hidden_size = H
    hc.position_embedding = "alibi"
    params, config = _convert_baichuan(hc, sd)
    assert config.pos_embedding == "alibi"
    ids = jnp.asarray(np.arange(10, dtype=np.int32)[None, :] % 128)
    full, _ = decoder_apply(params, config, ids)
    cache = init_kv_cache(config, 1, 16)
    _, cache = decoder_apply(params, config, ids[:, :9], cache)
    last, _ = decoder_apply(params, config, ids[:, 9:], cache)
    np.testing.assert_allclose(
        np.asarray(full[:, -1]), np.asarray(last[:, -1]), rtol=1e-3, atol=1e-3
    )


def test_qwen1_parity():
    """Qwen v1 layout (transformer.h, fused biased c_attn, w1/w2 SwiGLU) vs
    an HF Qwen2 oracle re-laid-out into qwen1 naming."""
    from types import SimpleNamespace

    cfg = hf.Qwen2Config(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=96,
        max_position_embeddings=64, tie_word_embeddings=False,
        rope_theta=10000.0,
    )
    torch.manual_seed(0)
    oracle = hf.Qwen2ForCausalLM(cfg).eval()
    osd = oracle.state_dict()
    sd = {"transformer.wte.weight": osd["model.embed_tokens.weight"],
          "transformer.ln_f.weight": osd["model.norm.weight"],
          "lm_head.weight": osd["lm_head.weight"]}
    for li in range(2):
        o = f"model.layers.{li}."
        q = f"transformer.h.{li}."
        sd[q + "attn.c_attn.weight"] = torch.cat(
            [osd[o + f"self_attn.{n}_proj.weight"] for n in ("q", "k", "v")], 0
        )
        sd[q + "attn.c_attn.bias"] = torch.cat(
            [osd[o + f"self_attn.{n}_proj.bias"] for n in ("q", "k", "v")], 0
        )
        sd[q + "attn.c_proj.weight"] = osd[o + "self_attn.o_proj.weight"]
        sd[q + "mlp.w2.weight"] = osd[o + "mlp.gate_proj.weight"]
        sd[q + "mlp.w1.weight"] = osd[o + "mlp.up_proj.weight"]
        sd[q + "mlp.c_proj.weight"] = osd[o + "mlp.down_proj.weight"]
        sd[q + "ln_1.weight"] = osd[o + "input_layernorm.weight"]
        sd[q + "ln_2.weight"] = osd[o + "post_attention_layernorm.weight"]
    hc = SimpleNamespace(
        model_type="qwen", vocab_size=128, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4, seq_length=64,
        rotary_emb_base=10000.0, layer_norm_epsilon=cfg.rms_norm_eps,
        intermediate_size=192,  # qwen configs store 2× the FFN width
    )
    params, config = decoder_params_from_hf(_fake(hc, sd))
    assert config.model_type == "qwen" and config.intermediate_size == 96
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 12)).astype(np.int64)
    with torch.no_grad():
        ref = oracle(torch.tensor(ids)).logits.float().numpy()
    got, _ = decoder_apply(params, config, jnp.asarray(ids, jnp.int32))
    got = np.asarray(got, np.float32)
    err = np.abs(
        (ref - ref.max(-1, keepdims=True)) - (got - got.max(-1, keepdims=True))
    ).max()
    assert err < 0.05, f"qwen1: max logit err {err}"


def test_reference_model_type_menu_covered():
    """Every model_type the reference advertises (modeling_auto.py:325-347)
    resolves to a converter (aliases included) or the llama family."""
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        _DECODER_CONVERTERS,
    )

    llama_family = {"llama", "tinyllama", "mistral", "qwen2", "phi3", "gemma"}
    reference_menu = [
        "llama", "gptj", "mpt", "opt", "gptneox", "dolly", "polyglot",
        "starcoder", "falcon", "bloom", "chatglm2", "chatglm", "baichuan",
        "mistral", "qwen", "phi", "whisper", "qwen2", "gemma", "phi3",
        "tinyllama",
    ]
    covered = set(_DECODER_CONVERTERS) | {"gpt_neox", "gptneox"} | llama_family
    covered.add("whisper")  # models/whisper.py
    missing = [m for m in reference_menu if m not in covered]
    assert not missing, missing


def test_from_hf_model_routes_generic_families():
    """Regression: families registered after the old static set (gemma,
    stablelm, chatglm) must route to the generic-decoder converter in
    AutoModelForCausalLM.from_hf_model, not fall through to the llama path."""
    from intel_extension_for_transformers_tpu.models.auto import (
        AutoModelForCausalLM,
    )

    cfg = hf.GemmaConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=64, head_dim=16,
    )
    torch.manual_seed(0)
    m = AutoModelForCausalLM.from_hf_model(hf.GemmaForCausalLM(cfg))
    assert m.model_type == "gemma"
