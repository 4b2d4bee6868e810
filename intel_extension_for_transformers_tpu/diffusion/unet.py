"""SD-class conditional UNet in pure JAX (NHWC, bf16-friendly).

Re-creation of the denoiser behind the reference's image2image plugin
(reference: pipeline/plugins/image2image/ drives diffusers' UNet2DConditionModel;
headline number SD v1.5 bf16 20 steps = 2.74 s, docs/release_data.md:88) —
re-derived TPU-first: NHWC convs (XLA's native TPU layout), one dataclass
config that scales from test-size to SD1.5, every block expressed as fused
jnp ops so XLA pipelines conv+groupnorm+silu.

Structure (SD1.5 = UNetConfig.sd15()):
conv_in → [CrossAttnDown ×3 (2 res + 2 attn each, downsample), Down (2 res)]
→ mid (res, attn, res) → mirrored up path with skip concats → out norm/conv.
Text conditioning enters through cross-attention over the CLIP hidden states;
timesteps through sinusoidal → 2-layer MLP added in every resblock.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attn_dim: int = 768
    attention_head_dim: int = 8  # heads = channels // (head_dim_factor)
    norm_groups: int = 32
    sample_size: int = 64

    @classmethod
    def sd15(cls) -> "UNetConfig":
        return cls()

    @classmethod
    def tiny(cls, cross_attn_dim: int = 32) -> "UNetConfig":
        return cls(
            block_channels=(32, 64),
            layers_per_block=1,
            cross_attn_dim=cross_attn_dim,
            norm_groups=8,
            sample_size=16,
        )

    @property
    def n_heads(self) -> int:
        return self.attention_head_dim


# ------------------------------ primitives ------------------------------


def _conv(x, p, stride: int = 1):
    """NHWC 3x3 (or kernel-shaped) conv + bias."""
    k = p["kernel"]  # (kh, kw, cin, cout)
    pad = (k.shape[0] // 2, k.shape[0] // 2)
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype),
        window_strides=(stride, stride),
        padding=(pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(y.dtype)


def _dense(x, p):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _group_norm(x, p, groups: int, eps: float = 1e-5):
    B = x.shape[0]
    C = x.shape[-1]
    g = x.reshape(B, -1, groups, C // groups)
    mean = jnp.mean(g.astype(jnp.float32), axis=(1, 3), keepdims=True)
    var = jnp.var(g.astype(jnp.float32), axis=(1, 3), keepdims=True)
    g = (g.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    y = g.reshape(x.shape).astype(x.dtype)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _layer_norm(x, p, eps=1e-5):
    m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    y = ((x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + eps)).astype(x.dtype)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal (B,) int timesteps → (B, dim) (diffusers convention)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _attention(q, k, v, n_heads: int):
    """(B, Lq, C) x (B, Lk, C) multi-head attention.

    Long SELF-attention (the 64×64-latent L=4096 blocks that dominate SD
    time) routes through the Pallas flash kernel — O(L) memory, no (L, L)
    score matrix in HBM; short/cross attention (text Lk=77) stays on the
    fused XLA path."""
    B, Lq, C = q.shape
    Lk = k.shape[1]
    hd = C // n_heads
    qh = q.reshape(B, Lq, n_heads, hd)
    kh = k.reshape(B, Lk, n_heads, hd)
    vh = v.reshape(B, Lk, n_heads, hd)
    if Lq == Lk and Lq >= 1024:
        from intel_extension_for_transformers_tpu.ops.flash_attention import (
            flash_attention,
        )

        out = flash_attention(qh, kh, vh, causal=False)
        return out.reshape(B, Lq, C)
    att = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(hd)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, vh)
    return out.reshape(B, Lq, C)


# ------------------------------ blocks ------------------------------


def _resblock(x, temb, p, cfg: UNetConfig):
    h = _group_norm(x, p["norm1"], cfg.norm_groups)
    h = _conv(jax.nn.silu(h), p["conv1"])
    h = h + _dense(jax.nn.silu(temb), p["time_emb"])[:, None, None, :]
    h = _group_norm(h, p["norm2"], cfg.norm_groups)
    h = _conv(jax.nn.silu(h), p["conv2"])
    skip = _conv(x, p["shortcut"]) if "shortcut" in p else x
    return skip + h


def _transformer_block(x, context, p, cfg: UNetConfig, channels: int):
    """GroupNorm → proj_in → (self-attn, cross-attn, geglu FF) → proj_out."""
    B, H, W, C = x.shape
    n_heads = max(1, channels // 64) if channels >= 64 else 1
    h = _group_norm(x, p["norm"], cfg.norm_groups)
    h = h.reshape(B, H * W, C) @ p["proj_in"]["kernel"].astype(x.dtype) + p[
        "proj_in"
    ]["bias"].astype(x.dtype)
    t = p["block"]
    # self attention
    hn = _layer_norm(h, t["ln1"])
    h = h + _attention(
        _dense(hn, t["q1"]), _dense(hn, t["k1"]), _dense(hn, t["v1"]), n_heads
    ) @ t["o1"]["kernel"].astype(x.dtype) + t["o1"]["bias"].astype(x.dtype)
    # cross attention over the text context
    hn = _layer_norm(h, t["ln2"])
    ctx = context.astype(x.dtype)
    h = h + _attention(
        _dense(hn, t["q2"]), _dense(ctx, t["k2"]), _dense(ctx, t["v2"]), n_heads
    ) @ t["o2"]["kernel"].astype(x.dtype) + t["o2"]["bias"].astype(x.dtype)
    # geglu feed-forward
    hn = _layer_norm(h, t["ln3"])
    gu = _dense(hn, t["ff_in"])
    g, u = jnp.split(gu, 2, axis=-1)
    # exact (erf) gelu — diffusers GEGLU uses F.gelu, not the tanh approx
    h = h + _dense(jax.nn.gelu(g, approximate=False) * u, t["ff_out"])
    h = h @ p["proj_out"]["kernel"].astype(x.dtype) + p["proj_out"]["bias"].astype(
        x.dtype
    )
    return x + h.reshape(B, H, W, C)


# ------------------------------ the UNet ------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def unet_apply(params, cfg: UNetConfig, latents, t, context):
    """latents (B, H, W, Cin), t (B,) int32, context (B, L, cross_dim)
    → eps prediction (B, H, W, Cout)."""
    ch0 = cfg.block_channels[0]
    temb = timestep_embedding(t, ch0)
    temb = _dense(jax.nn.silu(_dense(temb, params["time_mlp1"])), params["time_mlp2"])

    x = _conv(latents, params["conv_in"])
    skips = [x]
    # down path
    for bi, bp in enumerate(params["down"]):
        for li in range(cfg.layers_per_block):
            x = _resblock(x, temb, bp["res"][li], cfg)
            if bp["attn"] is not None:
                x = _transformer_block(
                    x, context, bp["attn"][li], cfg, cfg.block_channels[bi]
                )
            skips.append(x)
        if "down" in bp:
            x = _conv(x, bp["down"], stride=2)
            skips.append(x)
    # mid
    x = _resblock(x, temb, params["mid"]["res1"], cfg)
    x = _transformer_block(
        x, context, params["mid"]["attn"], cfg, cfg.block_channels[-1]
    )
    x = _resblock(x, temb, params["mid"]["res2"], cfg)
    # up path
    for bi, bp in enumerate(params["up"]):
        for li in range(cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = _resblock(x, temb, bp["res"][li], cfg)
            if bp["attn"] is not None:
                x = _transformer_block(
                    x, context, bp["attn"][li], cfg,
                    cfg.block_channels[::-1][bi],
                )
        if "up" in bp:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
            x = _conv(x, bp["up"])

    x = _group_norm(x, params["norm_out"], cfg.norm_groups)
    return _conv(jax.nn.silu(x), params["conv_out"])


# ------------------------------ init ------------------------------


def _init_conv(key, kh, cin, cout, scale=1.0):
    k1, _ = jax.random.split(key)
    fan = kh * kh * cin
    return {
        "kernel": jax.random.normal(k1, (kh, kh, cin, cout), jnp.float32)
        * scale / np.sqrt(fan),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def _init_dense(key, cin, cout, scale=1.0):
    return {
        "kernel": jax.random.normal(key, (cin, cout), jnp.float32)
        * scale / np.sqrt(cin),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def _init_norm(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _init_resblock(key, cin, cout, temb_dim):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": _init_norm(cin),
        "conv1": _init_conv(ks[0], 3, cin, cout),
        "time_emb": _init_dense(ks[1], temb_dim, cout),
        "norm2": _init_norm(cout),
        "conv2": _init_conv(ks[2], 3, cout, cout, scale=0.2),
    }
    if cin != cout:
        p["shortcut"] = _init_conv(ks[3], 1, cin, cout)
    return p


def _init_transformer(key, c, cross_dim):
    ks = jax.random.split(key, 12)
    ff = 4 * c
    return {
        "norm": _init_norm(c),
        "proj_in": _init_dense(ks[0], c, c),
        "proj_out": _init_dense(ks[1], c, c, scale=0.2),
        "block": {
            "ln1": _init_norm(c),
            "q1": _init_dense(ks[2], c, c),
            "k1": _init_dense(ks[3], c, c),
            "v1": _init_dense(ks[4], c, c),
            "o1": _init_dense(ks[5], c, c, scale=0.2),
            "ln2": _init_norm(c),
            "q2": _init_dense(ks[6], c, c),
            "k2": _init_dense(ks[7], cross_dim, c),
            "v2": _init_dense(ks[8], cross_dim, c),
            "o2": _init_dense(ks[9], c, c, scale=0.2),
            "ln3": _init_norm(c),
            "ff_in": _init_dense(ks[10], c, 2 * ff),
            "ff_out": _init_dense(ks[11], ff, c, scale=0.2),
        },
    }


def unet_init_params(key, cfg: UNetConfig) -> dict:
    chans = cfg.block_channels
    ch0 = chans[0]
    temb_dim = ch0 * 4
    keys = iter(jax.random.split(key, 4096))

    params = {
        "time_mlp1": _init_dense(next(keys), ch0, temb_dim),
        "time_mlp2": _init_dense(next(keys), temb_dim, temb_dim),
        "conv_in": _init_conv(next(keys), 3, cfg.in_channels, ch0),
        "down": [],
        "up": [],
        "norm_out": _init_norm(ch0),
        "conv_out": _init_conv(next(keys), 3, ch0, cfg.out_channels, scale=0.2),
    }
    # down
    skip_chans = [ch0]
    cin = ch0
    for bi, c in enumerate(chans):
        has_attn = bi < len(chans) - 1
        bp = {"res": [], "attn": [] if has_attn else None}
        for li in range(cfg.layers_per_block):
            bp["res"].append(_init_resblock(next(keys), cin, c, temb_dim))
            cin = c
            if has_attn:
                bp["attn"].append(
                    _init_transformer(next(keys), c, cfg.cross_attn_dim)
                )
            skip_chans.append(c)
        if bi < len(chans) - 1:
            bp["down"] = _init_conv(next(keys), 3, c, c)
            skip_chans.append(c)
        params["down"].append(bp)
    # mid
    cl = chans[-1]
    params["mid"] = {
        "res1": _init_resblock(next(keys), cl, cl, temb_dim),
        "attn": _init_transformer(next(keys), cl, cfg.cross_attn_dim),
        "res2": _init_resblock(next(keys), cl, cl, temb_dim),
    }
    # up (mirrored)
    rev = list(reversed(chans))
    cin = cl
    for bi, c in enumerate(rev):
        has_attn = bi >= 1 if len(chans) > 2 else bi == len(rev) - 1
        bp = {"res": [], "attn": [] if has_attn else None}
        for li in range(cfg.layers_per_block + 1):
            skip_c = skip_chans.pop()
            bp["res"].append(
                _init_resblock(next(keys), cin + skip_c, c, temb_dim)
            )
            cin = c
            if has_attn:
                bp["attn"].append(
                    _init_transformer(next(keys), c, cfg.cross_attn_dim)
                )
        if bi < len(rev) - 1:
            bp["up"] = _init_conv(next(keys), 3, c, c)
        params["up"].append(bp)
    return params
