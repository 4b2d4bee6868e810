"""Diffusers/transformers checkpoint converters for the SD stack.

Maps the reference deployment's checkpoint layout onto our param trees
(reference: pipeline/plugins/image2image/ loads a diffusers
StableDiffusionPipeline: UNet2DConditionModel + AutoencoderKL +
CLIPTextModel). Input is a state dict (torch tensors or numpy arrays) in
diffusers naming — `StableDiffusionPipeline.from_pretrained(...).unet
.state_dict()` etc. — so real SD1.5 weights drop into `unet_apply` /
`vae_decode` / `clip_text_apply` without diffusers installed here.

Conventions converted:
- torch conv (Cout, Cin, kh, kw) → NHWC HWIO (kh, kw, Cin, Cout)
- torch linear (Cout, Cin) → (Cin, Cout)
- diffusers GEGLU stores [value, gate] halves; our kernel computes
  gelu(first)·second, so the ff_in halves are SWAPPED on load
- diffusers UNet attention q/k/v have no bias → zero biases
- the VAE's quant_conv / post_quant_conv become `quant_conv` /
  `post_quant_conv` channel-mix entries that vae_encode/vae_decode apply
  when present (folding them into the neighboring 3×3 would change border
  behavior under zero padding).

Caveats (documented, not silently wrong): diffusers' VAE down/upsamplers
use asymmetric (0,1) padding where we pad symmetrically, and the spatial
transformer group norms use eps 1e-6 vs our 1e-5 — sub-pixel-level
differences on converted checkpoints.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

import jax.numpy as jnp

from intel_extension_for_transformers_tpu.diffusion.clip import ClipTextConfig
from intel_extension_for_transformers_tpu.diffusion.unet import UNetConfig
from intel_extension_for_transformers_tpu.diffusion.vae import VAEConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


class _SD:
    """State-dict view that records consumed keys (leftovers = naming bug)."""

    def __init__(self, sd: Mapping):
        self.sd = dict(sd)
        self.used = set()

    def __contains__(self, k):
        return k in self.sd

    def get(self, k) -> np.ndarray:
        self.used.add(k)
        return _np(self.sd[k])

    def leftovers(self):
        return sorted(set(self.sd) - self.used)


def _conv_p(sd: _SD, prefix: str) -> dict:
    w = sd.get(prefix + ".weight")  # (Cout, Cin, kh, kw)
    return {
        "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(sd.get(prefix + ".bias")),
    }


def _lin_p(sd: _SD, prefix: str, bias: bool = True) -> dict:
    w = sd.get(prefix + ".weight")  # (Cout, Cin)
    return {
        "kernel": jnp.asarray(w.T),
        "bias": jnp.asarray(sd.get(prefix + ".bias")) if bias
        else jnp.zeros((w.shape[0],), jnp.float32),
    }


def _lin_or_conv1x1(sd: _SD, prefix: str) -> dict:
    """proj_in/proj_out are Conv2d 1×1 in SD1.x, Linear in SD2.x."""
    w = sd.get(prefix + ".weight")
    if w.ndim == 4:  # (Cout, Cin, 1, 1)
        w = w[:, :, 0, 0]
    return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(sd.get(prefix + ".bias"))}


def _norm_p(sd: _SD, prefix: str) -> dict:
    return {
        "scale": jnp.asarray(sd.get(prefix + ".weight")),
        "bias": jnp.asarray(sd.get(prefix + ".bias")),
    }


# ------------------------------- UNet -------------------------------


def _unet_resblock(sd: _SD, p: str) -> dict:
    out = {
        "norm1": _norm_p(sd, p + ".norm1"),
        "conv1": _conv_p(sd, p + ".conv1"),
        "time_emb": _lin_p(sd, p + ".time_emb_proj"),
        "norm2": _norm_p(sd, p + ".norm2"),
        "conv2": _conv_p(sd, p + ".conv2"),
    }
    if p + ".conv_shortcut.weight" in sd:
        out["shortcut"] = _conv_p(sd, p + ".conv_shortcut")
    return out


def _geglu_swap(p: dict) -> dict:
    """diffusers GEGLU = value·gelu(gate) with [value, gate] halves; ours is
    gelu(g)·u with [g, u] halves → swap so g=gate, u=value."""
    k, b = np.asarray(p["kernel"]), np.asarray(p["bias"])
    half = k.shape[1] // 2
    return {
        "kernel": jnp.asarray(np.concatenate([k[:, half:], k[:, :half]], axis=1)),
        "bias": jnp.asarray(np.concatenate([b[half:], b[:half]])),
    }


def _unet_transformer(sd: _SD, p: str) -> dict:
    t = p + ".transformer_blocks.0"
    return {
        "norm": _norm_p(sd, p + ".norm"),
        "proj_in": _lin_or_conv1x1(sd, p + ".proj_in"),
        "proj_out": _lin_or_conv1x1(sd, p + ".proj_out"),
        "block": {
            "ln1": _norm_p(sd, t + ".norm1"),
            "q1": _lin_p(sd, t + ".attn1.to_q", bias=False),
            "k1": _lin_p(sd, t + ".attn1.to_k", bias=False),
            "v1": _lin_p(sd, t + ".attn1.to_v", bias=False),
            "o1": _lin_p(sd, t + ".attn1.to_out.0"),
            "ln2": _norm_p(sd, t + ".norm2"),
            "q2": _lin_p(sd, t + ".attn2.to_q", bias=False),
            "k2": _lin_p(sd, t + ".attn2.to_k", bias=False),
            "v2": _lin_p(sd, t + ".attn2.to_v", bias=False),
            "o2": _lin_p(sd, t + ".attn2.to_out.0"),
            "ln3": _norm_p(sd, t + ".norm3"),
            "ff_in": _geglu_swap(_lin_p(sd, t + ".ff.net.0.proj")),
            "ff_out": _lin_p(sd, t + ".ff.net.2"),
        },
    }


def unet_params_from_diffusers(
    state_dict: Mapping, cfg: UNetConfig = None, strict: bool = True
) -> tuple[dict, UNetConfig]:
    """diffusers UNet2DConditionModel.state_dict() → our tree."""
    cfg = cfg or UNetConfig.sd15()
    sd = _SD(state_dict)
    n = len(cfg.block_channels)
    params = {
        "time_mlp1": _lin_p(sd, "time_embedding.linear_1"),
        "time_mlp2": _lin_p(sd, "time_embedding.linear_2"),
        "conv_in": _conv_p(sd, "conv_in"),
        "norm_out": _norm_p(sd, "conv_norm_out"),
        "conv_out": _conv_p(sd, "conv_out"),
        "down": [],
        "up": [],
        "mid": {
            "res1": _unet_resblock(sd, "mid_block.resnets.0"),
            "attn": _unet_transformer(sd, "mid_block.attentions.0"),
            "res2": _unet_resblock(sd, "mid_block.resnets.1"),
        },
    }
    for bi in range(n):
        has_attn = bi < n - 1  # CrossAttnDownBlock2D ×(n-1) then DownBlock2D
        bp = {"res": [], "attn": [] if has_attn else None}
        for li in range(cfg.layers_per_block):
            bp["res"].append(
                _unet_resblock(sd, f"down_blocks.{bi}.resnets.{li}")
            )
            if has_attn:
                bp["attn"].append(
                    _unet_transformer(sd, f"down_blocks.{bi}.attentions.{li}")
                )
        if bi < n - 1:
            bp["down"] = _conv_p(sd, f"down_blocks.{bi}.downsamplers.0.conv")
        params["down"].append(bp)
    for bi in range(n):
        has_attn = bi >= 1 if n > 2 else bi == n - 1  # UpBlock2D first
        bp = {"res": [], "attn": [] if has_attn else None}
        for li in range(cfg.layers_per_block + 1):
            bp["res"].append(_unet_resblock(sd, f"up_blocks.{bi}.resnets.{li}"))
            if has_attn:
                bp["attn"].append(
                    _unet_transformer(sd, f"up_blocks.{bi}.attentions.{li}")
                )
        if bi < n - 1:
            bp["up"] = _conv_p(sd, f"up_blocks.{bi}.upsamplers.0.conv")
        params["up"].append(bp)
    if strict and sd.leftovers():
        raise ValueError(f"unconsumed UNet keys: {sd.leftovers()[:8]} ...")
    return params, cfg


# ------------------------------- VAE -------------------------------


def _vae_res(sd: _SD, p: str) -> dict:
    out = {
        "norm1": _norm_p(sd, p + ".norm1"),
        "conv1": _conv_p(sd, p + ".conv1"),
        "norm2": _norm_p(sd, p + ".norm2"),
        "conv2": _conv_p(sd, p + ".conv2"),
    }
    if p + ".conv_shortcut.weight" in sd:
        out["shortcut"] = _conv_p(sd, p + ".conv_shortcut")
    return out


def _vae_attn(sd: _SD, p: str) -> dict:
    # new naming to_q/..., old naming query/key/value/proj_attn
    new = p + ".to_q.weight" in sd

    def lin(new_name, old_name):
        w = sd.get(p + "." + (new_name if new else old_name) + ".weight")
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        b = sd.get(p + "." + (new_name if new else old_name) + ".bias")
        return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}

    return {
        "norm": _norm_p(sd, p + (".group_norm" if new else ".norm")),
        "q": lin("to_q", "query"),
        "k": lin("to_k", "key"),
        "v": lin("to_v", "value"),
        "o": lin("to_out.0", "proj_attn"),
    }


def _channel_mix(w: np.ndarray, b: np.ndarray) -> dict:
    """torch 1×1 conv (Cout, Cin, 1, 1) → channel-mix dense (Cin, Cout)."""
    w = w[:, :, 0, 0] if w.ndim == 4 else w
    return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}


def vae_params_from_diffusers(
    state_dict: Mapping, cfg: VAEConfig = None, strict: bool = True
) -> tuple[dict, VAEConfig]:
    """diffusers AutoencoderKL.state_dict() → our tree (quant convs folded)."""
    cfg = cfg or VAEConfig.sd15()
    sd = _SD(state_dict)
    n = len(cfg.block_channels)

    enc = {
        "conv_in": _conv_p(sd, "encoder.conv_in"),
        "down": [],
        "mid_res1": _vae_res(sd, "encoder.mid_block.resnets.0"),
        "mid_attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
        "mid_res2": _vae_res(sd, "encoder.mid_block.resnets.1"),
        "norm_out": _norm_p(sd, "encoder.conv_norm_out"),
        "conv_out": _conv_p(sd, "encoder.conv_out"),
    }
    for bi in range(n):
        bp = {"res": [
            _vae_res(sd, f"encoder.down_blocks.{bi}.resnets.{li}")
            for li in range(cfg.layers_per_block)
        ]}
        if bi < n - 1:
            bp["down"] = _conv_p(sd, f"encoder.down_blocks.{bi}.downsamplers.0.conv")
        enc["down"].append(bp)

    dec = {
        "conv_in": _conv_p(sd, "decoder.conv_in"),
        "mid_res1": _vae_res(sd, "decoder.mid_block.resnets.0"),
        "mid_attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
        "mid_res2": _vae_res(sd, "decoder.mid_block.resnets.1"),
        "up": [],
        "norm_out": _norm_p(sd, "decoder.conv_norm_out"),
        "conv_out": _conv_p(sd, "decoder.conv_out"),
    }
    for bi in range(n):
        bp = {"res": [
            _vae_res(sd, f"decoder.up_blocks.{bi}.resnets.{li}")
            for li in range(cfg.layers_per_block + 1)
        ]}
        if bi < n - 1:
            bp["up"] = _conv_p(sd, f"decoder.up_blocks.{bi}.upsamplers.0.conv")
        dec["up"].append(bp)

    # diffusers' standalone 1×1 quant convs become channel-mix entries (a
    # fold into the neighboring 3×3 would be wrong at zero-padded borders)
    if "quant_conv.weight" in sd:
        enc["quant_conv"] = _channel_mix(
            sd.get("quant_conv.weight"), sd.get("quant_conv.bias")
        )
    if "post_quant_conv.weight" in sd:
        dec["post_quant_conv"] = _channel_mix(
            sd.get("post_quant_conv.weight"), sd.get("post_quant_conv.bias")
        )
    if strict and sd.leftovers():
        raise ValueError(f"unconsumed VAE keys: {sd.leftovers()[:8]} ...")
    return {"encoder": enc, "decoder": dec}, cfg


# ------------------------------- CLIP -------------------------------


def clip_text_params_from_hf(hf_model) -> tuple[dict, ClipTextConfig]:
    """transformers CLIPTextModel → our tree (parity-tested vs torch)."""
    hc = hf_model.config
    cfg = ClipTextConfig(
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_layers=hc.num_hidden_layers,
        num_heads=hc.num_attention_heads,
        intermediate_size=hc.intermediate_size,
        max_length=hc.max_position_embeddings,
    )
    sd = _SD({k: v for k, v in hf_model.state_dict().items()
              if not k.endswith("position_ids")})
    t = "text_model."
    params = {
        "token_embed": jnp.asarray(sd.get(t + "embeddings.token_embedding.weight")),
        "pos_embed": jnp.asarray(sd.get(t + "embeddings.position_embedding.weight")),
        "ln_final": _norm_p(sd, t + "final_layer_norm"),
        "layers": [],
    }
    for li in range(cfg.num_layers):
        p = f"{t}encoder.layers.{li}."
        params["layers"].append(
            {
                "ln1": _norm_p(sd, p + "layer_norm1"),
                "q": _lin_p(sd, p + "self_attn.q_proj"),
                "k": _lin_p(sd, p + "self_attn.k_proj"),
                "v": _lin_p(sd, p + "self_attn.v_proj"),
                "o": _lin_p(sd, p + "self_attn.out_proj"),
                "ln2": _norm_p(sd, p + "layer_norm2"),
                "fc1": _lin_p(sd, p + "mlp.fc1"),
                "fc2": _lin_p(sd, p + "mlp.fc2"),
            }
        )
    return params, cfg
