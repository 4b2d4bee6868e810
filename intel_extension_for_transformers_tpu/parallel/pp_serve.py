"""Pipeline-parallel SERVING: pp×tp decode for the continuous-batching engine.

Beyond the reference (SURVEY.md §2.3: PP absent in ITREX; its serving TP is
DeepSpeed AutoTP, model_utils.py:249-291). `parallel/pipeline.py` pipelines
TRAINING forwards; this module pipelines the *decode step* so one model's
weights spread over `pp` stages × `tp` shards of a mesh and the engine's
whole slot pool advances one token per step program:

- Layers are stacked and split into S stages; each stage's slice lives on one
  `pp` mesh slot, with Megatron-style tensor parallelism INSIDE each stage
  (q/k/v/gate/up column-sharded, o/down row-sharded + one `psum` over `tp`
  per block) — all inside a single `shard_map`, so the collectives ride ICI.
- The KV cache is staged the same way: (S, L/S, B, T, Hkv, D) with the head
  dim tp-sharded; each pp rank owns only its layers' cache.
- A decode tick runs S sequential stage hops (one `ppermute` each). Every
  rank computes each tick and commits its cache only on ITS tick — the
  static-shape SPMD formulation of sequential pipeline inference.
- Per-slot cache lengths + a per-slot `write_mask` let the engine prefill a
  joining slot IN PLACE (chunk by chunk) while other slots keep decoding —
  no separate insert/scatter step.

Greedy parity with the single-device engine is pinned by
tests/test_pp_serving.py (pp=2 × tp=2 on the 8-device CPU mesh).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from intel_extension_for_transformers_tpu.ops.layers import (
    apply_rotary,
    layer_norm,
    rms_norm,
    rope_inv_freq,
    rotary_embedding,
)
from intel_extension_for_transformers_tpu.models.llama import _kv_quantize


@dataclass
class PPCache:
    """Stage-stacked KV cache: k/v (S, L/S, B, T, Hkv, D), length (B,).

    With k_scale/v_scale set (pp_init_cache(dtype="int8")) the k/v buffers
    hold int8 codes and the (S, L/S, B, T, Hkv) f32 scales dequantize them
    on attend — the staged form of the single-device int8 cache
    (models/llama.py KVCache/_kv_quantize), halving per-stage KV HBM."""

    k: jax.Array
    v: jax.Array
    length: jax.Array  # (B,) int32 per-slot fill
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None


jax.tree_util.register_dataclass(
    PPCache, data_fields=["k", "v", "length", "k_scale", "v_scale"],
    meta_fields=[],
)


@dataclass(frozen=True, eq=False)  # eq=False → identity hash (static jit arg)
class PPServeState:
    """Stage/tp-sharded decoder weights + the serving mesh (static).

    Covers the llama family AND the generic-decoder families
    (models/decoder.py: GPT-J/NeoX/OPT/BLOOM/MPT/Falcon/Phi/BigCode/
    StableLM/ChatGLM/Baichuan/Qwen-v1/Gemma) — `final_norm` holds a bare
    scale (llama) or a {"scale"[, "bias"]} dict (decoder LayerNorm), and
    `extras` carries the optional replicated leaves some families need
    (lm_head bias, learned position table, BLOOM embedding norm)."""

    staged: dict  # layer tree with (S, L/S, ...) leaves, pp+tp sharded
    embed: jax.Array  # (V, H) replicated
    final_norm: object  # bare (H,) scale or {"scale"[, "bias"]} dict
    lm_head: jax.Array  # (H, V) replicated
    mesh: Mesh
    extras: Optional[dict] = None


_COL = {"q", "k", "v", "gate", "up"}  # output-dim (column) parallel
_ROW = {"o", "down"}  # input-dim (row) parallel → psum


def _layer_specs(layer: dict, kv_replicated: bool = False,
                 staged: bool = False) -> dict:
    """PartitionSpec tree for ONE stacked-staged decoder layer: every leaf
    has leading (pp-sharded) stage + layer axes, then its own dims;
    attention q/k/v and mlp gate/up shard their output dim over tp, o/down
    their input dim (Megatron pairing — one psum per block). Norm leaves
    (bare arrays or {"scale","bias"} dicts) replicate over tp.

    kv_replicated: MQA families (num_key_value_heads == 1, e.g. Falcon-7B,
    GPT-BigCode) keep k/v projections and cache replicated over tp — one KV
    head cannot shard."""

    def walk(node, name):
        if isinstance(node, dict) and "kernel" in node:
            if name in _COL:
                t = None if (kv_replicated and name in ("k", "v")) else "tp"
                out = {"kernel": P("pp", None, None, t)}
                if "bias" in node:
                    out["bias"] = P("pp", None, t)
                return out
            if name in _ROW:
                out = {"kernel": P("pp", None, "tp", None)}
                if "bias" in node:
                    out["bias"] = P("pp", None, None)
                return out
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        own = node.ndim - (2 if staged else 0)  # strip (S, Lr) if staged
        return P("pp", None, *([None] * own))

    return walk(layer, "")


# kept under the old name for callers that imported it
_llama_layer_specs = _layer_specs


def _kv_layout(config, mesh: Mesh) -> bool:
    """→ kv_replicated. Validates head divisibility for Megatron tp."""
    tp = mesh.shape["tp"]
    nh, nkv = config.num_attention_heads, config.num_key_value_heads
    if nh % tp:
        raise ValueError(
            f"{nh} attention heads not divisible by tp={tp} — use a smaller "
            f"tp (pure pp works for any head count)"
        )
    if nkv % tp == 0:
        return False
    if nkv == 1:
        return True  # MQA: replicate the single KV head
    raise ValueError(
        f"num_key_value_heads={nkv} neither divisible by tp={tp} nor MQA"
    )


def build_pp_serve_state(params: dict, config, mesh: Mesh) -> PPServeState:
    """Stack + stage + shard decoder params (llama-family or generic
    DecoderConfig families) for pp×tp serving."""
    if getattr(config, "num_local_experts", 0):
        raise NotImplementedError("pp serving does not cover MoE yet")
    S = mesh.shape["pp"]
    L = config.num_hidden_layers
    if L % S:
        raise ValueError(f"{L} layers not divisible by pp={S}")
    kv_replicated = _kv_layout(config, mesh)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])
    staged = jax.tree.map(
        lambda x: x.reshape(S, L // S, *x.shape[1:]), stacked
    )
    specs = _layer_specs(params["layers"][0], kv_replicated)
    staged = jax.tree.map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), staged, specs
    )
    rep = NamedSharding(mesh, P())

    def put_rep(tree):
        return jax.tree.map(
            lambda a: jax.device_put(jnp.asarray(a), rep), tree
        )

    lm = params["lm_head"]["kernel"]
    extras = {}
    if "bias" in params["lm_head"]:
        extras["lm_head_bias"] = put_rep(params["lm_head"]["bias"])
    if "pos_embed" in params:
        extras["pos_embed"] = put_rep(params["pos_embed"])
    if "embed_norm" in params:
        extras["embed_norm"] = put_rep(params["embed_norm"])
    return PPServeState(
        staged=staged,
        embed=put_rep(jnp.asarray(params["embed_tokens"])),
        final_norm=put_rep(params["final_norm"]),
        lm_head=put_rep(jnp.asarray(lm)),
        mesh=mesh,
        extras=extras or None,
    )


def pp_init_cache(state: PPServeState, config, batch: int, max_len: int,
                  dtype=jnp.bfloat16) -> PPCache:
    mesh = state.mesh
    S = mesh.shape["pp"]
    Lr = config.num_hidden_layers // S
    kv_tp = None if _kv_layout(config, mesh) else "tp"
    shape = (S, Lr, batch, max_len, config.num_key_value_heads,
             config.head_dim)
    sh = NamedSharding(mesh, P("pp", None, None, None, kv_tp, None))
    quantized = dtype in ("int8", jnp.int8)
    buf_dtype = jnp.int8 if quantized else dtype
    zeros = jax.jit(
        lambda: jnp.zeros(shape, buf_dtype), out_shardings=sh
    )
    scales = None
    if quantized:
        ssh = NamedSharding(mesh, P("pp", None, None, None, kv_tp))
        scales = jax.jit(
            lambda: jnp.zeros(shape[:-1], jnp.float32), out_shardings=ssh
        )
    return PPCache(
        k=zeros(), v=zeros(),
        length=jax.device_put(
            jnp.zeros((batch,), jnp.int32), NamedSharding(mesh, P())
        ),
        k_scale=scales() if quantized else None,
        v_scale=scales() if quantized else None,
    )


def _nrm(h, p, config, generic: bool):
    """Final/embed/layer norm over a bare llama scale or a decoder
    {"scale"[, "bias"]} dict, per the config's norm_type."""
    if not generic:
        return rms_norm(h, p, config.rms_norm_eps)
    eps = config.norm_eps
    if config.norm_type == "rmsnorm":
        return rms_norm(h, p["scale"], eps)
    if config.norm_type == "rmsnorm_1p":  # Gemma zero-centered weights
        return rms_norm(h, p["scale"] + 1.0, eps)
    b = p.get("bias")
    if b is None:
        b = jnp.zeros_like(p["scale"])
    return layer_norm(h, p["scale"], b, eps)


@partial(jax.jit, static_argnames=("state", "config", "with_mass"))
def pp_apply(
    state: PPServeState,
    config,
    ids: jax.Array,  # (B, T)
    cache: PPCache,
    n_valid: jax.Array,  # (B,) — how far each slot's length advances
    write_mask: jax.Array,  # (B,) bool — slots whose cache commits
    with_mass: bool = False,
):
    """Forward (B, T) tokens through the pipelined stack → (logits, cache)
    [, mass].

    Same cache contract as models.llama.llama_apply, vectorized per slot:
    slot b's K/V write at [length[b], length[b]+T) and its length advances by
    n_valid[b] (pads past it are overwritten before any query attends them);
    slots outside write_mask neither write nor advance.

    Dispatches on config type: LlamaConfig runs the flagship llama layer;
    DecoderConfig runs the generic-family layer (rope partial/interleaved,
    ALiBi, learned positions, LayerNorm±bias, parallel residual/shared-LN,
    plain or gated MLP, proj biases, MQA-replicated KV) — mirroring
    models/decoder.py:_decoder_layer inside the tp shard.

    with_mass=True additionally returns per-key attention mass
    (B, T, Smax) f32 summed over layers and heads — the H2O statistic the
    single-device path taps via ops.layers.set_mass_tap, here collected on
    each stage's own commit tick and psum'd over pp (layers) and tp
    (heads)."""
    mesh = state.mesh
    B, T = ids.shape
    S = mesh.shape["pp"]
    tp = mesh.shape["tp"]
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)
    generic = hasattr(config, "pos_embedding")
    kv_replicated = _kv_layout(config, mesh)
    rope_on = (config.pos_embedding == "rope") if generic else True
    rd = config.rotary_dim if generic else hd
    interleaved = bool(generic and config.rotary_interleaved)
    alibi = bool(generic and config.pos_embedding == "alibi")

    x = jnp.take(state.embed, ids, axis=0)  # (B, T, H)
    positions = cache.length[:, None] + jnp.arange(T)[None, :]  # (B, T)
    if generic and config.embed_scale:
        x = x * jnp.asarray(config.hidden_size, jnp.float32) ** 0.5
    if generic and config.embedding_norm:
        x = _nrm(x, state.extras["embed_norm"], config, generic)
    if generic and config.pos_embedding == "learned":
        x = x + jnp.take(
            state.extras["pos_embed"],
            positions + config.learned_pos_offset, axis=0,
        ).astype(x.dtype)
    if rope_on:
        if generic:
            inv = 1.0 / (
                config.rope_theta
                ** (jnp.arange(0, rd, 2, jnp.float32) / rd)
            )
            ang = positions.astype(jnp.float32)[..., None] * inv
            cos, sin = jnp.cos(ang), jnp.sin(ang)  # (B, T, rd/2)
        else:
            cos, sin = rotary_embedding(
                positions, hd, config.rope_theta,
                getattr(config, "rope_scaling", None),
            )
    else:
        cos = sin = jnp.zeros((1,), jnp.float32)  # unused placeholders
    if alibi:
        from intel_extension_for_transformers_tpu.models.decoder import (
            alibi_slopes,
        )

        slopes = jnp.asarray(alibi_slopes(nh))  # (nh,), tp-sharded operand
    else:
        slopes = jnp.zeros((tp,), jnp.float32)
    Smax = cache.k.shape[3]
    ki = jnp.arange(Smax)[None, None, :]
    qi = positions[:, :, None]
    mask = ki <= qi  # (B, T, Smax)
    if getattr(config, "sliding_window", None) is not None:
        mask = mask & (qi - ki < config.sliding_window)
    mask = mask[:, None, :, :]  # (B, 1, T, Smax)
    posmat = positions.astype(jnp.int32)  # scatter rows per slot
    bidx = jnp.arange(B)

    def layer_fwd(layer, kl, vl, kls, vls, h, cos, sin, mask, posmat,
                  wmask_b, slopes_l):
        """One tp-sharded decoder layer over local (B,T,H) + local cache
        (B, Smax, Hkv[/tp], D). Mirrors models/llama.py:_decoder_layer
        (llama) / models/decoder.py:_decoder_layer (generic families).
        kls/vls (B, Smax, Hkv[/tp]) f32 present → int8 cache: quantize the
        new rows ONCE at write, dequantize on attend (same contract as the
        single-device int8 KV cache)."""
        att = layer["attention"]
        n1 = layer["ln1"] if generic else layer["input_norm"]
        xn = _nrm(h, n1, config, generic)

        def lin(p, z=None):
            zz = xn if z is None else z
            y = jnp.einsum("btk,kn->btn", zz, p["kernel"].astype(zz.dtype),
                           preferred_element_type=zz.dtype)
            if "bias" in p:
                y = y + p["bias"].astype(y.dtype)
            return y

        nh_l = nh // tp
        nkv_l = nkv if kv_replicated else nkv // tp
        q = lin(att["q"]).reshape(B, T, nh_l, hd)
        k = lin(att["k"]).reshape(B, T, nkv_l, hd)
        v = lin(att["v"]).reshape(B, T, nkv_l, hd)
        if rope_on and generic:

            def rot(t):  # partial + optionally interleaved rotary
                c = cos[:, :, None, :].astype(t.dtype)
                s = sin[:, :, None, :].astype(t.dtype)
                r = t[..., :rd]
                if interleaved:  # GPT-J pairs
                    x1, x2 = r[..., ::2], r[..., 1::2]
                    rr = jnp.stack(
                        [x1 * c - x2 * s, x2 * c + x1 * s], axis=-1
                    ).reshape(r.shape)
                else:  # NeoX half-split
                    x1, x2 = jnp.split(r, 2, axis=-1)
                    rr = jnp.concatenate(
                        [x1 * c - x2 * s, x2 * c + x1 * s], axis=-1
                    )
                if rd < t.shape[-1]:
                    return jnp.concatenate([rr, t[..., rd:]], axis=-1)
                return rr

            q, k = rot(q), rot(k)
        elif rope_on:
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)

        wm = wmask_b[:, None, None, None]
        if kls is not None:
            k8, ksc = _kv_quantize(k)
            v8, vsc = _kv_quantize(v)
            kl = jnp.where(wm, kl.at[bidx[:, None], posmat].set(k8), kl)
            vl = jnp.where(wm, vl.at[bidx[:, None], posmat].set(v8), vl)
            wm3 = wmask_b[:, None, None]
            kls = jnp.where(wm3, kls.at[bidx[:, None], posmat].set(ksc), kls)
            vls = jnp.where(wm3, vls.at[bidx[:, None], posmat].set(vsc), vls)
            k_all = kl.astype(h.dtype) * kls[..., None].astype(h.dtype)
            v_all = vl.astype(h.dtype) * vls[..., None].astype(h.dtype)
        else:
            kl_new = kl.at[bidx[:, None], posmat].set(k.astype(kl.dtype))
            vl_new = vl.at[bidx[:, None], posmat].set(v.astype(vl.dtype))
            kl = jnp.where(wm, kl_new, kl)
            vl = jnp.where(wm, vl_new, vl)
            k_all, v_all = kl.astype(h.dtype), vl.astype(h.dtype)
        if nkv_l != nh_l:
            rep = nh_l // nkv_l
            k_all = jnp.repeat(k_all, rep, axis=2)
            v_all = jnp.repeat(v_all, rep, axis=2)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_all, preferred_element_type=jnp.float32
        ) * (1.0 / hd**0.5)
        if alibi:
            dist = (ki[0] - posmat[:, :, None]).astype(jnp.float32)
            logits = logits + (
                slopes_l[None, :, None, None] * dist[:, None, :, :]
            )
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        # H2O statistic: per-key mass summed over this shard's heads
        # (psum over tp/pp happens once at the stage boundary)
        mass_l = (jnp.sum(probs.astype(jnp.float32), axis=1)
                  if with_mass else None)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v_all,
                         preferred_element_type=h.dtype)
        attn = jnp.einsum(
            "btk,kn->btn", ctx.reshape(B, T, nh_l * hd),
            att["o"]["kernel"].astype(h.dtype),
            preferred_element_type=h.dtype,
        )
        attn = jax.lax.psum(attn, "tp")
        if "bias" in att["o"]:  # row-parallel bias: add ONCE, after psum
            attn = attn + att["o"]["bias"].astype(attn.dtype)

        mlp = layer["mlp"]

        def lin2(p, z):
            y = jnp.einsum("btk,kn->btn", z, p["kernel"].astype(z.dtype),
                           preferred_element_type=z.dtype)
            if "bias" in p:  # column-parallel bias (local slice)
                y = y + p["bias"].astype(y.dtype)
            return y

        def act(z):
            if not generic:
                return jax.nn.silu(z)
            kind = config.activation
            if kind == "relu":
                return jax.nn.relu(z)
            if kind == "silu":
                return jax.nn.silu(z)
            return jax.nn.gelu(z, approximate=(kind == "gelu_new"))

        def mlp_out(mn):
            if (not generic) or config.gated_mlp:
                y = act(lin2(mlp["gate"], mn)) * lin2(mlp["up"], mn)
            else:
                y = act(lin2(mlp["up"], mn))
            down = mlp["down"]
            o = jax.lax.psum(
                jnp.einsum("btk,kn->btn", y, down["kernel"].astype(y.dtype),
                           preferred_element_type=y.dtype),
                "tp",
            )
            if "bias" in down:  # row-parallel bias: once, after psum
                o = o + down["bias"].astype(o.dtype)
            return o

        if generic and config.parallel_residual:
            mn = xn if config.shared_ln else _nrm(
                h, layer["ln2"], config, generic
            )
            h = h + attn + mlp_out(mn)
        else:
            h = h + attn
            n2 = layer["ln2"] if generic else layer["post_norm"]
            h = h + mlp_out(_nrm(h, n2, config, generic))
        return h, kl, vl, kls, vls, mass_l

    quantized = cache.k_scale is not None

    def shard_fn(*args):
        if quantized:
            (staged_local, k_local, v_local, ks_local, vs_local, x, cos,
             sin, mask, posmat, wmask_b, slopes_l) = args
        else:
            (staged_local, k_local, v_local, x, cos, sin, mask, posmat,
             wmask_b, slopes_l) = args
            ks_local = vs_local = None
        # locals arrive (1, Lr, ...) on the stage axis — drop it
        stage_params = jax.tree.map(lambda a: a[0], staged_local)
        k_st, v_st = k_local[0], v_local[0]  # (Lr, B, Smax, Hkv[/tp], D)
        ks_st = ks_local[0] if quantized else None
        vs_st = vs_local[0] if quantized else None
        s = jax.lax.axis_index("pp")

        def stage_compute(h, k_st, v_st, ks_st, vs_st):
            def body(h, inputs):
                layer, kl, vl, kls, vls = inputs
                h, kl, vl, kls, vls, mass_l = layer_fwd(
                    layer, kl, vl, kls, vls, h, cos, sin, mask, posmat,
                    wmask_b, slopes_l,
                )
                return h, (kl, vl, kls, vls, mass_l)

            h, (k_new, v_new, ks_new, vs_new, mass_ls) = jax.lax.scan(
                body, h, (stage_params, k_st, v_st, ks_st, vs_st)
            )
            mass_st = jnp.sum(mass_ls, axis=0) if with_mass else None
            return h, k_new, v_new, ks_new, vs_new, mass_st

        def commit_sel(commit, new, old):
            return None if old is None else jnp.where(commit, new, old)

        buf = x
        h_out = x
        mass_acc = None
        perm = [(i, (i + 1) % S) for i in range(S)]
        for tick in range(S):
            h_out, k_new, v_new, ks_new, vs_new, mass_new = stage_compute(
                buf, k_st, v_st, ks_st, vs_st
            )
            commit = s == tick  # each rank owns exactly one tick
            k_st = jnp.where(commit, k_new, k_st)
            v_st = jnp.where(commit, v_new, v_st)
            ks_st = commit_sel(commit, ks_new, ks_st)
            vs_st = commit_sel(commit, vs_new, vs_st)
            if with_mass:
                # the mass from a stage's layers is valid only on its own
                # tick (the hidden state is the real one then)
                mass_acc = (
                    jnp.where(commit, mass_new, 0.0) if mass_acc is None
                    else mass_acc + jnp.where(commit, mass_new, 0.0)
                )
            if S > 1:
                buf = jax.lax.ppermute(h_out, "pp", perm)
        final = jax.lax.psum(jnp.where(s == S - 1, h_out, 0.0), "pp")
        out = [final, k_st[None], v_st[None]]
        if quantized:
            out += [ks_st[None], vs_st[None]]
        if with_mass:
            out.append(jax.lax.psum(jax.lax.psum(mass_acc, "tp"), "pp"))
        return tuple(out)

    kv_tp = None if kv_replicated else "tp"
    cspec = P("pp", None, None, None, kv_tp, None)
    sspec = P("pp", None, None, None, kv_tp)
    pspec = _layer_specs(state.staged, kv_replicated, staged=True)
    operands = [state.staged, cache.k, cache.v]
    in_specs = [pspec, cspec, cspec]
    if quantized:
        operands += [cache.k_scale, cache.v_scale]
        in_specs += [sspec, sspec]
    operands += [x, cos, sin, mask, posmat, write_mask, slopes]
    in_specs += [P()] * 6 + [P("tp")]
    out_specs = [P(), cspec, cspec]
    if quantized:
        out_specs += [sspec, sspec]
    if with_mass:
        out_specs.append(P())
    result = list(jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        check_vma=False,
    )(*operands))
    mass = result.pop() if with_mass else None
    if quantized:
        hidden, new_k, new_v, new_ks, new_vs = result
    else:
        hidden, new_k, new_v = result
        new_ks = new_vs = None

    hidden = _nrm(hidden, state.final_norm, config, generic)
    logits = jnp.einsum(
        "bth,hv->btv", hidden, state.lm_head.astype(hidden.dtype),
        preferred_element_type=hidden.dtype,
    )
    if state.extras and "lm_head_bias" in state.extras:
        logits = logits + state.extras["lm_head_bias"].astype(logits.dtype)
    length = jnp.where(
        write_mask, cache.length + n_valid.astype(jnp.int32), cache.length
    )
    new_cache = PPCache(k=new_k, v=new_v, length=length,
                        k_scale=new_ks, v_scale=new_vs)
    if with_mass:
        return logits, new_cache, mass
    return logits, new_cache


@partial(jax.jit, static_argnames=("rope_spec",))
def pp_compact_slot(cache: PPCache, slot, keep_idx, rope_spec):
    """Compact ONE slot of the staged pool cache to its kept rows (the
    pp×tp form of models/engine.py:_compact_cache_slot — KV eviction for
    unbounded chats on pipeline-served models).

    keep_idx (K,) int32 ascending original rows → new rows 0..K-1. Kept
    keys are re-rotated by their position delta (RoPE angles are linear in
    position); int8 caches dequantize, rotate, and requantize (rotation
    can grow a component by √2 → scales recomputed). Every op is a local
    per-(pp, tp)-shard transform along unsharded axes (T gather, D
    rotation), so GSPMD partitions it with no resharding — no shard_map
    needed."""
    K = keep_idx.shape[0]
    deltas = jnp.arange(K, dtype=jnp.int32) - keep_idx  # (K,) ≤ 0

    def rot(kk):  # (S, Lr, K, Hkv, D) float → per-row delta rotation
        if rope_spec is None:
            return kk
        kind, rd, theta, scaling = rope_spec
        inv = rope_inv_freq(rd, theta, scaling)  # (rd/2,)
        ang = deltas.astype(jnp.float32)[:, None] * inv  # (K, rd/2)
        cos = jnp.cos(ang)[None, None, :, None, :].astype(kk.dtype)
        sin = jnp.sin(ang)[None, None, :, None, :].astype(kk.dtype)
        r = kk[..., :rd]
        if kind == "interleaved":
            x1, x2 = r[..., ::2], r[..., 1::2]
            rr = jnp.stack(
                [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
            ).reshape(r.shape)
        else:
            x1, x2 = jnp.split(r, 2, axis=-1)
            rr = jnp.concatenate(
                [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
            )
        if rd < kk.shape[-1]:
            return jnp.concatenate([rr, kk[..., rd:]], axis=-1)
        return rr

    kk = jnp.take(cache.k[:, :, slot], keep_idx, axis=2)  # (S, Lr, K, H, D)
    vv = jnp.take(cache.v[:, :, slot], keep_idx, axis=2)
    if cache.k_scale is not None:
        ks = jnp.take(cache.k_scale[:, :, slot], keep_idx, axis=2)
        vs = jnp.take(cache.v_scale[:, :, slot], keep_idx, axis=2)
        kf = rot(kk.astype(jnp.float32) * ks[..., None])
        nks = jnp.max(jnp.abs(kf), axis=-1) / 127.0
        kq = jnp.clip(
            jnp.round(kf / jnp.maximum(nks[..., None], 1e-8)), -127, 127
        ).astype(jnp.int8)
        return replace(
            cache,
            k=cache.k.at[:, :, slot, :K].set(kq),
            v=cache.v.at[:, :, slot, :K].set(vv),
            k_scale=cache.k_scale.at[:, :, slot, :K].set(nks),
            v_scale=cache.v_scale.at[:, :, slot, :K].set(vs),
            length=cache.length.at[slot].set(K),
        )
    return replace(
        cache,
        k=cache.k.at[:, :, slot, :K].set(
            rot(kk.astype(jnp.float32)).astype(cache.k.dtype)
        ),
        v=cache.v.at[:, :, slot, :K].set(vv),
        length=cache.length.at[slot].set(K),
    )


@partial(jax.jit, static_argnames=("state", "config", "with_mass"))
def pp_prefill_chunk(state, config, cache, chunk, slot, n_valid, mass=None,
                     with_mass: bool = False):
    """Prefill ONE (1, C) chunk of a joining slot IN PLACE in the pool cache
    (write_mask singles the slot out; other slots are untouched).
    → (last-real-token logits (V,) f32, cache[, accumulated mass (Smax,)]).

    with_mass mirrors models/engine.py:_prefill_chunk — pad queries past
    n_valid are masked out of the H2O statistic."""
    B = cache.length.shape[0]
    C = chunk.shape[1]
    ids = jnp.zeros((B, C), jnp.int32).at[slot].set(chunk[0])
    onehot = jnp.arange(B) == slot
    out = pp_apply(
        state, config, ids, cache,
        n_valid=jnp.where(onehot, n_valid, 0),
        write_mask=onehot,
        with_mass=with_mass,
    )
    if with_mass:
        logits, cache, mass_all = out
        qvalid = (jnp.arange(C) < n_valid)[:, None]
        mass = mass + jnp.sum(
            jnp.where(qvalid, mass_all[slot], 0.0), axis=0
        )
    else:
        logits, cache = out
    last = logits[slot, jnp.clip(n_valid - 1, 0, C - 1)].astype(jnp.float32)
    if with_mass:
        return last, cache, mass
    return last, cache
