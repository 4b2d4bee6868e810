"""SD checkpoint converter tests (COVERAGE.md round-3 queue #3: diffusers
is absent in this environment, so the UNet/VAE converters are exercised via
diffusers-NAMED state dicts built here, the CLIP converter via real
transformers torch parity, and the layout-sensitive transforms — GEGLU half
swap, quant-conv folding — via direct numerical checks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from intel_extension_for_transformers_tpu.diffusion.hf_convert import (  # noqa: E402
    _geglu_swap,
    clip_text_params_from_hf,
    unet_params_from_diffusers,
    vae_params_from_diffusers,
)
from intel_extension_for_transformers_tpu.diffusion.clip import (  # noqa: E402
    clip_text_apply,
)
from intel_extension_for_transformers_tpu.diffusion.unet import (  # noqa: E402
    UNetConfig,
    unet_apply,
    unet_init_params,
)
from intel_extension_for_transformers_tpu.diffusion.vae import (  # noqa: E402
    VAEConfig,
    vae_decode,
    vae_encode,
    vae_init_params,
)


def test_clip_text_parity_vs_hf():
    cfg = transformers.CLIPTextConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = transformers.CLIPTextModel(cfg)
    hf.eval()
    params, ccfg = clip_text_params_from_hf(hf)
    ids = np.random.default_rng(0).integers(0, 256, (2, 12))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    out = np.asarray(clip_text_apply(params, ccfg, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)


def test_geglu_swap_matches_diffusers_formula():
    """ours: g,u = split(x@K); gelu(g)*u  must equal
    diffusers: h,gate = split(x@Wd.T); h*gelu(gate)."""
    rng = np.random.default_rng(1)
    C, F = 8, 12
    Wd = rng.normal(size=(2 * F, C)).astype(np.float32)  # torch (out, in)
    bd = rng.normal(size=(2 * F,)).astype(np.float32)
    x = rng.normal(size=(5, C)).astype(np.float32)

    import math

    y = x @ Wd.T + bd
    h, gate = y[:, :F], y[:, F:]
    gelu = lambda v: 0.5 * v * (1 + np.vectorize(math.erf)(v / np.sqrt(2)))  # noqa: E731
    expected = h * gelu(gate)

    p = _geglu_swap({"kernel": jnp.asarray(Wd.T), "bias": jnp.asarray(bd)})
    z = x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])
    g, u = z[:, :F], z[:, F:]
    got = np.asarray(jax.nn.gelu(jnp.asarray(g), approximate=False)) * u
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_vae_quant_conv_placement():
    """Explicit quant convs must act exactly where diffusers puts them:
    quant_conv AFTER encoder.conv_out (pre-moment-split), post_quant_conv
    BEFORE decoder.conv_in (post-unscale) — verified with a 2× scaling mix
    whose effect is analytically predictable."""
    cfg = VAEConfig.tiny()
    params = vae_init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    lat = np.asarray(vae_encode(params, cfg, img))

    import copy

    C = 2 * cfg.latent_channels
    p2 = copy.deepcopy(params)
    p2["encoder"]["quant_conv"] = {
        "kernel": jnp.asarray(2.0 * np.eye(C, dtype=np.float32)),
        "bias": jnp.zeros((C,), jnp.float32),
    }
    # doubling the moments doubles the (noise-free) scaled mean latent
    lat2 = np.asarray(vae_encode(p2, cfg, img))
    np.testing.assert_allclose(lat2, 2.0 * lat, rtol=1e-5, atol=1e-5)

    p3 = copy.deepcopy(params)
    L = cfg.latent_channels
    p3["decoder"]["post_quant_conv"] = {
        "kernel": jnp.asarray(2.0 * np.eye(L, dtype=np.float32)),
        "bias": jnp.zeros((L,), jnp.float32),
    }
    # post-quant 2× before conv_in ≡ feeding 2× the latents without it
    a = np.asarray(vae_decode(p3, cfg, jnp.asarray(lat)))
    b = np.asarray(vae_decode(params, cfg, jnp.asarray(2.0 * lat)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


# ----------------- diffusers-named state-dict round trips -----------------


def _t(a):
    return torch.tensor(np.asarray(a, np.float32))


def _conv_out(sd, name, p):
    sd[name + ".weight"] = _t(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
    sd[name + ".bias"] = _t(p["bias"])


def _lin_out(sd, name, p, bias=True):
    sd[name + ".weight"] = _t(np.asarray(p["kernel"]).T)
    if bias:
        sd[name + ".bias"] = _t(p["bias"])


def _norm_out(sd, name, p):
    sd[name + ".weight"] = _t(p["scale"])
    sd[name + ".bias"] = _t(p["bias"])


def _res_out(sd, pre, p, with_time=True):
    _norm_out(sd, pre + ".norm1", p["norm1"])
    _conv_out(sd, pre + ".conv1", p["conv1"])
    if with_time:
        _lin_out(sd, pre + ".time_emb_proj", p["time_emb"])
    _norm_out(sd, pre + ".norm2", p["norm2"])
    _conv_out(sd, pre + ".conv2", p["conv2"])
    if "shortcut" in p:
        _conv_out(sd, pre + ".conv_shortcut", p["shortcut"])


def _attn_out(sd, pre, p):
    _norm_out(sd, pre + ".norm", p["norm"])
    _lin_out(sd, pre + ".proj_in", p["proj_in"])
    _lin_out(sd, pre + ".proj_out", p["proj_out"])
    t = p["block"]
    b = pre + ".transformer_blocks.0"
    _norm_out(sd, b + ".norm1", t["ln1"])
    _lin_out(sd, b + ".attn1.to_q", t["q1"], bias=False)
    _lin_out(sd, b + ".attn1.to_k", t["k1"], bias=False)
    _lin_out(sd, b + ".attn1.to_v", t["v1"], bias=False)
    _lin_out(sd, b + ".attn1.to_out.0", t["o1"])
    _norm_out(sd, b + ".norm2", t["ln2"])
    _lin_out(sd, b + ".attn2.to_q", t["q2"], bias=False)
    _lin_out(sd, b + ".attn2.to_k", t["k2"], bias=False)
    _lin_out(sd, b + ".attn2.to_v", t["v2"], bias=False)
    _lin_out(sd, b + ".attn2.to_out.0", t["o2"])
    _norm_out(sd, b + ".norm3", t["ln3"])
    # inverse GEGLU swap: put [value, gate] back in diffusers order
    k = np.asarray(t["ff_in"]["kernel"])
    bb = np.asarray(t["ff_in"]["bias"])
    half = k.shape[1] // 2
    _lin_out(sd, b + ".ff.net.0.proj", {
        "kernel": np.concatenate([k[:, half:], k[:, :half]], axis=1),
        "bias": np.concatenate([bb[half:], bb[:half]]),
    })
    _lin_out(sd, b + ".ff.net.2", t["ff_out"])


def test_unet_diffusers_state_dict_round_trip():
    """Export our tiny UNet tree under diffusers naming, convert back with
    strict=True (no unconsumed keys), and check the forward is identical —
    catches naming-scheme and channel-bookkeeping mismatches."""
    cfg = UNetConfig.tiny()
    ref_params = unet_init_params(jax.random.PRNGKey(0), cfg)
    sd = {}
    _lin_out(sd, "time_embedding.linear_1", ref_params["time_mlp1"])
    _lin_out(sd, "time_embedding.linear_2", ref_params["time_mlp2"])
    _conv_out(sd, "conv_in", ref_params["conv_in"])
    _norm_out(sd, "conv_norm_out", ref_params["norm_out"])
    _conv_out(sd, "conv_out", ref_params["conv_out"])
    _res_out(sd, "mid_block.resnets.0", ref_params["mid"]["res1"])
    _attn_out(sd, "mid_block.attentions.0", ref_params["mid"]["attn"])
    _res_out(sd, "mid_block.resnets.1", ref_params["mid"]["res2"])
    for bi, bp in enumerate(ref_params["down"]):
        for li, rp in enumerate(bp["res"]):
            _res_out(sd, f"down_blocks.{bi}.resnets.{li}", rp)
        if bp["attn"] is not None:
            for li, ap in enumerate(bp["attn"]):
                _attn_out(sd, f"down_blocks.{bi}.attentions.{li}", ap)
        if "down" in bp:
            _conv_out(sd, f"down_blocks.{bi}.downsamplers.0.conv", bp["down"])
    for bi, bp in enumerate(ref_params["up"]):
        for li, rp in enumerate(bp["res"]):
            _res_out(sd, f"up_blocks.{bi}.resnets.{li}", rp)
        if bp["attn"] is not None:
            for li, ap in enumerate(bp["attn"]):
                _attn_out(sd, f"up_blocks.{bi}.attentions.{li}", ap)
        if "up" in bp:
            _conv_out(sd, f"up_blocks.{bi}.upsamplers.0.conv", bp["up"])

    params, _ = unet_params_from_diffusers(sd, cfg, strict=True)

    rng = np.random.default_rng(3)
    lat = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
    t = jnp.asarray([7], jnp.int32)
    ctx = jnp.asarray(rng.normal(size=(1, 8, cfg.cross_attn_dim)).astype(np.float32))
    ref = np.asarray(unet_apply(ref_params, cfg, lat, t, ctx))
    got = np.asarray(unet_apply(params, cfg, lat, t, ctx))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_vae_diffusers_state_dict_round_trip():
    cfg = VAEConfig.tiny()
    ref_params = vae_init_params(jax.random.PRNGKey(1), cfg)
    sd = {}
    enc, dec = ref_params["encoder"], ref_params["decoder"]
    _conv_out(sd, "encoder.conv_in", enc["conv_in"])
    _res_out(sd, "encoder.mid_block.resnets.0", enc["mid_res1"], with_time=False)
    _res_out(sd, "encoder.mid_block.resnets.1", enc["mid_res2"], with_time=False)
    a = enc["mid_attn"]
    _norm_out(sd, "encoder.mid_block.attentions.0.group_norm", a["norm"])
    for nm, key in (("to_q", "q"), ("to_k", "k"), ("to_v", "v"), ("to_out.0", "o")):
        _lin_out(sd, f"encoder.mid_block.attentions.0.{nm}", a[key])
    _norm_out(sd, "encoder.conv_norm_out", enc["norm_out"])
    _conv_out(sd, "encoder.conv_out", enc["conv_out"])
    for bi, bp in enumerate(enc["down"]):
        for li, rp in enumerate(bp["res"]):
            _res_out(sd, f"encoder.down_blocks.{bi}.resnets.{li}", rp,
                     with_time=False)
        if "down" in bp:
            _conv_out(sd, f"encoder.down_blocks.{bi}.downsamplers.0.conv",
                      bp["down"])
    _conv_out(sd, "decoder.conv_in", dec["conv_in"])
    _res_out(sd, "decoder.mid_block.resnets.0", dec["mid_res1"], with_time=False)
    _res_out(sd, "decoder.mid_block.resnets.1", dec["mid_res2"], with_time=False)
    a = dec["mid_attn"]
    _norm_out(sd, "decoder.mid_block.attentions.0.group_norm", a["norm"])
    for nm, key in (("to_q", "q"), ("to_k", "k"), ("to_v", "v"), ("to_out.0", "o")):
        _lin_out(sd, f"decoder.mid_block.attentions.0.{nm}", a[key])
    _norm_out(sd, "decoder.conv_norm_out", dec["norm_out"])
    _conv_out(sd, "decoder.conv_out", dec["conv_out"])
    for bi, bp in enumerate(dec["up"]):
        for li, rp in enumerate(bp["res"]):
            _res_out(sd, f"decoder.up_blocks.{bi}.resnets.{li}", rp,
                     with_time=False)
        if "up" in bp:
            _conv_out(sd, f"decoder.up_blocks.{bi}.upsamplers.0.conv", bp["up"])
    # identity quant convs exercise the folding path without changing values
    C = 2 * cfg.latent_channels
    sd["quant_conv.weight"] = _t(np.eye(C, dtype=np.float32)[:, :, None, None])
    sd["quant_conv.bias"] = _t(np.zeros((C,), np.float32))
    sd["post_quant_conv.weight"] = _t(
        np.eye(cfg.latent_channels, dtype=np.float32)[:, :, None, None]
    )
    sd["post_quant_conv.bias"] = _t(np.zeros((cfg.latent_channels,), np.float32))

    params, _ = vae_params_from_diffusers(sd, cfg, strict=True)
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    ref_lat = np.asarray(vae_encode(ref_params, cfg, img))
    got_lat = np.asarray(vae_encode(params, cfg, img))
    np.testing.assert_allclose(got_lat, ref_lat, rtol=1e-5, atol=1e-5)
    ref_img = np.asarray(vae_decode(ref_params, cfg, jnp.asarray(ref_lat)))
    got_img = np.asarray(vae_decode(params, cfg, jnp.asarray(got_lat)))
    np.testing.assert_allclose(got_img, ref_img, rtol=1e-5, atol=1e-5)
