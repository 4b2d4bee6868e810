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
    """Stage/tp-sharded llama-family weights + the serving mesh (static)."""

    staged: dict  # layer tree with (S, L/S, ...) leaves, pp+tp sharded
    embed: jax.Array  # (V, H) replicated
    final_norm: jax.Array
    lm_head: jax.Array  # (H, V) replicated
    mesh: Mesh


def _llama_layer_specs(layer: dict) -> dict:
    """PartitionSpec tree for ONE stacked-staged llama layer: every leaf has
    leading (pp-sharded) stage + layer axes, then its own dims; attention
    q/k/v and mlp gate/up shard their output dim over tp, o/down their input
    dim (Megatron pairing — one psum per block)."""

    def col(p):  # kernel (S, Lr, K, N) → N over tp; bias (S, Lr, N) → tp
        out = {"kernel": P("pp", None, None, "tp")}
        if "bias" in p:
            out["bias"] = P("pp", None, "tp")
        return out

    def row(p):
        out = {"kernel": P("pp", None, "tp", None)}
        if "bias" in p:
            out["bias"] = P("pp", None, None)
        return out

    return {
        "input_norm": P("pp", None, None),
        "attention": {
            "q": col(layer["attention"]["q"]),
            "k": col(layer["attention"]["k"]),
            "v": col(layer["attention"]["v"]),
            "o": row(layer["attention"]["o"]),
        },
        "post_norm": P("pp", None, None),
        "mlp": {
            "gate": col(layer["mlp"]["gate"]),
            "up": col(layer["mlp"]["up"]),
            "down": row(layer["mlp"]["down"]),
        },
    }


def build_pp_serve_state(params: dict, config, mesh: Mesh) -> PPServeState:
    """Stack + stage + shard llama-family params for pp×tp serving."""
    if getattr(config, "num_local_experts", 0):
        raise NotImplementedError("pp serving does not cover MoE yet")
    S = mesh.shape["pp"]
    L = config.num_hidden_layers
    if L % S:
        raise ValueError(f"{L} layers not divisible by pp={S}")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])
    staged = jax.tree.map(
        lambda x: x.reshape(S, L // S, *x.shape[1:]), stacked
    )
    specs = _llama_layer_specs(params["layers"][0])
    staged = jax.tree.map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), staged, specs
    )
    rep = NamedSharding(mesh, P())
    lm = params["lm_head"]["kernel"]
    return PPServeState(
        staged=staged,
        embed=jax.device_put(jnp.asarray(params["embed_tokens"]), rep),
        final_norm=jax.device_put(jnp.asarray(params["final_norm"]), rep),
        lm_head=jax.device_put(jnp.asarray(lm), rep),
        mesh=mesh,
    )


def pp_init_cache(state: PPServeState, config, batch: int, max_len: int,
                  dtype=jnp.bfloat16) -> PPCache:
    mesh = state.mesh
    S = mesh.shape["pp"]
    Lr = config.num_hidden_layers // S
    shape = (S, Lr, batch, max_len, config.num_key_value_heads,
             config.head_dim)
    sh = NamedSharding(mesh, P("pp", None, None, None, "tp", None))
    quantized = dtype in ("int8", jnp.int8)
    buf_dtype = jnp.int8 if quantized else dtype
    zeros = jax.jit(
        lambda: jnp.zeros(shape, buf_dtype), out_shardings=sh
    )
    scales = None
    if quantized:
        ssh = NamedSharding(mesh, P("pp", None, None, None, "tp"))
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
    eps = config.rms_norm_eps

    x = jnp.take(state.embed, ids, axis=0)  # (B, T, H)
    positions = cache.length[:, None] + jnp.arange(T)[None, :]  # (B, T)
    cos, sin = rotary_embedding(
        positions, hd, config.rope_theta, getattr(config, "rope_scaling", None)
    )
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
                  wmask_b):
        """One tp-sharded decoder layer over local (B,T,H) + local cache
        (B, Smax, Hkv/tp, D). Mirrors models/llama.py:_decoder_layer.
        kls/vls (B, Smax, Hkv/tp) f32 present → int8 cache: quantize the
        new rows ONCE at write, dequantize on attend (same contract as the
        single-device int8 KV cache)."""
        att = layer["attention"]
        xn = rms_norm(h, layer["input_norm"], eps)

        def lin(p):
            y = jnp.einsum("btk,kn->btn", xn, p["kernel"].astype(xn.dtype),
                           preferred_element_type=xn.dtype)
            if "bias" in p:
                y = y + p["bias"].astype(y.dtype)
            return y

        nh_l, nkv_l = nh // tp, nkv // tp
        q = lin(att["q"]).reshape(B, T, nh_l, hd)
        k = lin(att["k"]).reshape(B, T, nkv_l, hd)
        v = lin(att["v"]).reshape(B, T, nkv_l, hd)
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
        h = h + jax.lax.psum(attn, "tp")

        mlp = layer["mlp"]
        xn2 = rms_norm(h, layer["post_norm"], eps)

        def lin2(p, z):
            return jnp.einsum("btk,kn->btn", z, p["kernel"].astype(z.dtype),
                              preferred_element_type=z.dtype)

        y = jax.nn.silu(lin2(mlp["gate"], xn2)) * lin2(mlp["up"], xn2)
        h = h + jax.lax.psum(lin2(mlp["down"], y), "tp")
        return h, kl, vl, kls, vls, mass_l

    quantized = cache.k_scale is not None

    def shard_fn(*args):
        if quantized:
            (staged_local, k_local, v_local, ks_local, vs_local, x, cos,
             sin, mask, posmat, wmask_b) = args
        else:
            (staged_local, k_local, v_local, x, cos, sin, mask, posmat,
             wmask_b) = args
            ks_local = vs_local = None
        # locals arrive (1, Lr, ...) on the stage axis — drop it
        stage_params = jax.tree.map(lambda a: a[0], staged_local)
        k_st, v_st = k_local[0], v_local[0]  # (Lr, B, Smax, Hkv/tp, D)
        ks_st = ks_local[0] if quantized else None
        vs_st = vs_local[0] if quantized else None
        s = jax.lax.axis_index("pp")

        def stage_compute(h, k_st, v_st, ks_st, vs_st):
            def body(h, inputs):
                layer, kl, vl, kls, vls = inputs
                h, kl, vl, kls, vls, mass_l = layer_fwd(
                    layer, kl, vl, kls, vls, h, cos, sin, mask, posmat,
                    wmask_b,
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

    cspec = P("pp", None, None, None, "tp", None)
    sspec = P("pp", None, None, None, "tp")
    pspec = _llama_layer_specs(state.staged)  # same tree shape as one layer
    operands = [state.staged, cache.k, cache.v]
    in_specs = [pspec, cspec, cspec]
    if quantized:
        operands += [cache.k_scale, cache.v_scale]
        in_specs += [sspec, sspec]
    operands += [x, cos, sin, mask, posmat, write_mask]
    in_specs += [P()] * 6
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

    hidden = rms_norm(hidden, state.final_norm, eps)
    logits = jnp.einsum(
        "bth,hv->btv", hidden, state.lm_head.astype(hidden.dtype),
        preferred_element_type=hidden.dtype,
    )
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
