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
