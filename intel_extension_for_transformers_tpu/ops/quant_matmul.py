"""Weight-only-quantized matmul: the TPU replacement for qbits' AMX/VNNI GEMM.

The reference's hot inference op is `qbits.woq_linear`
(reference: qbits/qbits.cpp:113 → woq::dispatch_woq_task → BesTLA JIT GEMM;
python hot loop llm/quantization/nn/modules.py:140 → autograd/functions.py:184
`matmul_kbit`). Here the same contract — activations in bf16/f32, weights in
packed int4/int8/nf4/fp4 with group scales — is implemented two ways:

1. `woq_matmul_ref`: dequantize-then-einsum in pure XLA. Ground truth for
   tests (the analogue of the reference's *_ref kernels, e.g.
   kernels/src/cpu/kernels/mha_dense_ref.cpp) and the fallback path.
2. `woq_matmul`: a Pallas TPU kernel that never materializes the dequantized
   weight in HBM. Per (M,N)-tile it streams packed int4 blocks into VMEM,
   dequantizes the tile on the VPU with the per-group scales (and zero
   points) folded in, and runs ONE (TM,TK)·(TK,TN) MXU dot per K-step —
   per-group mini-dots would leave the MXU pipeline idle at decode sizes.
   Ragged N (vocab heads) is tile-padded, never a fallback.

The 4-bit half-split layout (see ops/packing.py) means the low and high
nibbles are independent K-slices: the kernel reads the activation tile twice
(once per half) and never performs a row interleave.

Backward (for QLoRA, reference autograd/functions.py:147 MatMulKBit.backward):
custom_vjp returning dx = g @ W^T via the dequantized weight; the quantized
weight itself gets no gradient.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from intel_extension_for_transformers_tpu.ops.codebooks import get_codebook
from intel_extension_for_transformers_tpu.ops.packing import (
    QuantizedTensor,
    dequantize,
)
from intel_extension_for_transformers_tpu.utils.device import use_pallas_interpret


def woq_matmul_ref(x: jax.Array, qt: QuantizedTensor, out_dtype=None) -> jax.Array:
    """Dequantize-then-matmul ground truth. x: (..., K) → (..., N)."""
    out_dtype = out_dtype or x.dtype
    w = dequantize(qt, dtype=jnp.float32)
    out = jnp.einsum(
        "...k,kn->...n",
        x.astype(jnp.float32),
        w,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)


def _decode_nibbles(packed_i8, *, signed: bool):
    """int8 block of packed bytes → (lo, hi) int32 nibble planes.

    The decode is the VPU-bound part of the kernel at decode batch sizes, so
    sign extension uses shift pairs (4 VPU ops total) instead of the
    mask/xor/sub chain (7 ops). Mosaic has no i8 vector shifts, so lanes are
    i32."""
    p = packed_i8.astype(jnp.int32)
    if signed:
        lo = (p << 28) >> 28  # arithmetic shifts sign-extend the nibble
        hi = (p << 24) >> 28
    else:
        lo = p & 0xF
        hi = (p >> 4) & 0xF
    return lo, hi


def _codebook_lookup(idx_i32, cb_vals):
    """Decode 4-bit codebook indices with 16 vectorized selects (VPU)."""
    out = jnp.zeros(idx_i32.shape, jnp.float32)
    for i, v in enumerate(cb_vals):
        out = jnp.where(idx_i32 == i, jnp.float32(v), out)
    return out


def _woq_kernel_4bit(
    x_lo_ref,
    x_hi_ref,
    w_ref,
    s_ref,
    z_ref,
    o_ref,
    acc_ref,
    *,
    group_size: int,
    num_k_steps: int,
    groups_per_half: int,
    scheme: str,
    codebook: Optional[tuple],
    compute_dtype,
):
    """Grid: (M/TM, N/TN, K2/TK). K innermost; acc in VMEM scratch.

    s_ref/z_ref hold ALL group rows (small) column-blocked; row offsets are
    computed from the K-step because tiny row blocks violate TPU tiling rules.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    signed = scheme == "sym" and codebook is None

    tk = w_ref.shape[0]
    tn = w_ref.shape[1]
    n_groups = tk // group_size
    # Large whole-K tiles (e.g. Falcon down-proj: TK=9088, TN=256 — no legal
    # multi-step TK since 9088 = 128·71) must NOT decode in one shot: the two
    # int32 nibble planes alone are 8·TK·TN bytes (18.6 MB there), far past
    # VMEM, so Mosaic spills and the DMA pipeline stalls (measured 210 GB/s
    # vs 330 for the same bytes in falcon_up-sized pieces). Decode the tile
    # in STATIC chunks of whole groups instead; chunks only engage on the
    # single-K-step path, so multi-step dynamic scale offsets stay 8-aligned.
    max_chunk_elems = 320 * 1024
    if num_k_steps == 1 and tk * tn > max_chunk_elems:
        # chunk size in groups: largest multiple of 8 groups that fits the
        # element budget (8-aligned sublane counts for the scale rows); the
        # remainder rides in a smaller tail chunk
        gpc = max(8, (max_chunk_elems // (tn * group_size)) // 8 * 8)
        gpc = min(gpc, n_groups)
    else:
        gpc = n_groups
    chunk_groups = [gpc] * (n_groups // gpc)
    if n_groups % gpc:
        chunk_groups.append(n_groups % gpc)

    acc = acc_ref[:]
    g0 = 0
    for cg in chunk_groups:
        gpc, rows = cg, cg * group_size
        r0 = g0 * group_size
        lo, hi = _decode_nibbles(w_ref[r0 : r0 + rows, :], signed=signed)
        # Fold the per-group scales (and zero points) into the dequantized
        # tile on the VPU, then ONE (TM, rows)·(rows, TN) MXU dot per half —
        # per-group mini-dots would leave the MXU pipeline mostly idle at
        # decode sizes.
        for half, (plane, x_ref) in enumerate(((lo, x_lo_ref), (hi, x_hi_ref))):
            if codebook is not None:
                qvals = _codebook_lookup(plane, codebook).astype(compute_dtype)
            else:
                qvals = plane.astype(compute_dtype)
            if num_k_steps == 1:
                # k == 0: STATIC slice — works at any group alignment
                b0 = half * groups_per_half + g0
                srows = s_ref[b0 : b0 + gpc, :].astype(compute_dtype)
                zrows = (
                    z_ref[b0 : b0 + gpc, :].astype(compute_dtype)
                    if scheme == "asym"
                    else None
                )
            else:
                # dynamic offsets: per-step group counts are 8-aligned by
                # construction (_pick_tiles), so Mosaic can prove alignment
                base = half * groups_per_half + k * n_groups
                srows = s_ref[pl.ds(base, n_groups), :].astype(compute_dtype)
                zrows = (
                    z_ref[pl.ds(base, n_groups), :].astype(compute_dtype)
                    if scheme == "asym"
                    else None
                )
            q3 = qvals.reshape(gpc, group_size, tn)
            if scheme == "asym":
                w_deq = ((q3 - zrows[:, None, :]) * srows[:, None, :]).reshape(
                    rows, tn
                )
            else:
                w_deq = (q3 * srows[:, None, :]).reshape(rows, tn)
            acc = acc + jax.lax.dot(
                x_ref[:, r0 : r0 + rows].astype(compute_dtype),
                w_deq,
                precision=(
                    jax.lax.Precision.HIGHEST
                    if compute_dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT
                ),
                preferred_element_type=jnp.float32,
            )
        g0 += cg
    acc_ref[:] = acc

    @pl.when(k == num_k_steps - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _woq_kernel_8bit(
    x_ref,
    w_ref,
    s_ref,
    z_ref,
    o_ref,
    acc_ref,
    *,
    group_size: int,
    num_k_steps: int,
    scheme: str,
    compute_dtype,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = w_ref[:].astype(jnp.int32)
    if scheme == "asym":
        q = q & 0xFF  # stored as wrapped uint8
    qvals = q.astype(compute_dtype)
    tk = w_ref.shape[0]
    tn = w_ref.shape[1]
    n_groups = tk // group_size
    acc = acc_ref[:]
    # scale-on-weight + single MXU dot per K-step (see the 4-bit kernel)
    if num_k_steps == 1:
        srows = s_ref[0:n_groups, :].astype(compute_dtype)
        zrows = (
            z_ref[0:n_groups, :].astype(compute_dtype)
            if scheme == "asym"
            else None
        )
    else:
        base = k * n_groups
        srows = s_ref[pl.ds(base, n_groups), :].astype(compute_dtype)
        zrows = (
            z_ref[pl.ds(base, n_groups), :].astype(compute_dtype)
            if scheme == "asym"
            else None
        )
    q3 = qvals.reshape(n_groups, group_size, tn)
    if scheme == "asym":
        w_deq = ((q3 - zrows[:, None, :]) * srows[:, None, :]).reshape(tk, tn)
    else:
        w_deq = (q3 * srows[:, None, :]).reshape(tk, tn)
    acc = acc + jax.lax.dot(
        x_ref[:].astype(compute_dtype),
        w_deq,
        precision=(
            jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc

    @pl.when(k == num_k_steps - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _woq_kernel_w32(
    x_ref,
    w_ref,
    s_ref,
    z_ref,
    o_ref,
    acc_ref,
    *,
    group_size: int,
    num_k_steps: int,
    scheme: str,
    compute_dtype,
    m1_path: bool,
    interpret: bool,
):
    """Decode-optimized int4 kernel over the w32 layout (VERDICT r2 #1).

    Nibble decode assembles bf16 BIT PATTERNS directly: a biased nibble
    v' in [0,15] OR'd into 0x4300 is the bf16 value 128+v' exactly, so one
    shift+mask+or per PAIR of nibbles (plus pltpu.bitcast, which is free)
    replaces the shift/sign-extend/convert/scale chain (~3 int ops per packed
    byte instead of ~9 — the VPU was the M=1 bottleneck at 44-55% of the HBM
    floor). The +128+bias offset is removed EXACTLY:

    - m1_path (decode shapes): per-128-row-plane dots give per-group partial
      sums in f32; scales apply to the partials, and the offset contributes
      scale*(128+bias)*sum(x_group), subtracted via one tiny (tm, G)x(G, tn)
      dot. All cancellation happens in f32 — bit-for-bit this matches
      computing with exact (v+offset) products.
    - large-M (prefill): offset and scale fold into the weight plane before
      the MXU dot (numerically identical to the khalf kernel).

    Layout contract (packing._khalf_to_w32): word kw of each 64-word block
    holds nibble slot s at bits [4s, 4s+4); view j = (word >> 4j) & 0x000F000F
    OR 0x43004300, bitcast i32->bf16, lands slot j in sublane 2*kw and slot
    j+4 in 2*kw+1 = natural rows 128j + {2kw, 2kw+1} of the block.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = w_ref[:]  # (tk//8, tn) int32
    tk = w_ref.shape[0] * 8
    tn = w_ref.shape[1]
    tm = x_ref.shape[0]
    g = group_size
    n_groups = tk // g
    asym = scheme == "asym"

    if num_k_steps == 1:
        srows = s_ref[0:n_groups, :]
        zrows = z_ref[0:n_groups, :] if asym else None
    else:
        base = k * n_groups  # n_groups is a multiple of 8 by construction
        srows = s_ref[pl.ds(base, n_groups), :]
        zrows = z_ref[pl.ds(base, n_groups), :] if asym else None
    srows_f = srows.astype(jnp.float32)
    zeff = (zrows.astype(jnp.float32) + 128.0) if asym else None

    x = x_ref[:]
    acc = acc_ref[:]
    hi_prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    if m1_path:
        # offset-correction term: sum_g (128+bias)[g,n]*s[g,n]*sum(x_g).
        # Per-group x sums via an MXU dot against a block-indicator matrix —
        # Mosaic cannot reshape the lane dim (tk) into (n_groups, g).
        kig = jax.lax.broadcasted_iota(jnp.int32, (tk, n_groups), 0) // g
        gid = jax.lax.broadcasted_iota(jnp.int32, (tk, n_groups), 1)
        gmask = (kig == gid).astype(jnp.float32)
        xs = jax.lax.dot(
            x.astype(jnp.float32), gmask,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (tm, n_groups)
        corr_w = srows_f * (zeff if asym else 136.0)
        acc = acc - jax.lax.dot(
            xs, corr_w,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    gpp = 128 // g if g < 128 else 1  # groups per 128-row plane
    for b in range(tk // 512):
        wb = words[b * 64 : (b + 1) * 64]  # (64, tn)
        for j in range(4):
            t = (wb >> (4 * j)) if j else wb
            wv = jnp.int32(0x43004300) | (t & jnp.int32(0x000F000F))
            if interpret:
                pair = jax.lax.bitcast_convert_type(wv, jnp.bfloat16)
                plane = pair.transpose(0, 2, 1).reshape(128, tn)
            else:
                plane = pltpu.bitcast(wv, jnp.bfloat16)  # (128, tn)
            row0 = b * 512 + j * 128
            if m1_path:
                for gi in range(gpp):
                    span = 128 // gpp
                    g_idx = row0 // g + gi
                    xg = x[:, row0 + gi * span : row0 + (gi + 1) * span]
                    pg = plane[gi * span : (gi + 1) * span]
                    part = jax.lax.dot(
                        xg.astype(compute_dtype),
                        pg.astype(compute_dtype),
                        precision=hi_prec,
                        preferred_element_type=jnp.float32,
                    )
                    acc = acc + part * srows_f[g_idx : g_idx + 1, :]
            else:
                pf = plane.astype(jnp.float32)
                g_lo = row0 // g
                if gpp == 1:
                    sc = srows_f[g_lo : g_lo + 1, :]
                    zc = zeff[g_lo : g_lo + 1, :] if asym else 136.0
                    wd = ((pf - zc) * sc).astype(compute_dtype)
                else:
                    p3 = pf.reshape(gpp, g, tn)
                    sc = srows_f[g_lo : g_lo + gpp, :][:, None, :]
                    zc = (
                        zeff[g_lo : g_lo + gpp, :][:, None, :]
                        if asym
                        else 136.0
                    )
                    wd = ((p3 - zc) * sc).reshape(128, tn).astype(compute_dtype)
                acc = acc + jax.lax.dot(
                    x[:, row0 : row0 + 128].astype(compute_dtype),
                    wd,
                    precision=hi_prec,
                    preferred_element_type=jnp.float32,
                )
    acc_ref[:] = acc

    @pl.when(k == num_k_steps - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _w32_tiles(M: int, Kp: int, g: int):
    """Tile sizes for the w32 kernel: tk = largest multiple of
    lcm(512, 8g) dividing Kp, capped at 2048."""
    tm = min(_round_up(max(M, 1), 8), 256)
    unit = max(512, 8 * g)
    d = Kp // unit
    tk = unit
    for m in range(d, 0, -1):
        if d % m == 0 and unit * m <= 2048:
            tk = unit * m
            break
    return tm, 256, tk


def _pallas_woq_w32(x2, batch_shape, qt: QuantizedTensor, out_dtype, interpret):
    M, K = x2.shape
    g = qt.group_size
    N = qt.N
    Kp = qt.data.shape[0] * 8
    compute_dtype = jnp.float32 if x2.dtype == jnp.float32 else jnp.bfloat16
    tm, tn, tk = _w32_tiles(M, Kp, g)
    # m1: scale-after-dot per group (exact offset cancellation in f32) — the
    # MXU flop multiplier is 128/g for g<128, so gate on small M
    m1_path = (g >= 128) or tm <= 32

    data = qt.data
    scales = qt.scales.astype(jnp.float32)
    zeros = (
        jnp.zeros((1, N), jnp.float32)
        if qt.zeros is None
        else qt.zeros.astype(jnp.float32)
    )
    Np = _round_up(N, tn)
    if Np != N:
        data = jnp.pad(data, ((0, 0), (0, Np - N)))
        scales = jnp.pad(scales, ((0, 0), (0, Np - N)))
        zeros = jnp.pad(zeros, ((0, 0), (0, Np - N)))
    Mp = _round_up(M, tm)
    if Mp != M or Kp != K:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, Kp - K)))
    grid = (Mp // tm, Np // tn, Kp // tk)

    kernel = functools.partial(
        _woq_kernel_w32,
        group_size=g,
        num_k_steps=grid[2],
        scheme=qt.scheme,
        compute_dtype=compute_dtype,
        m1_path=m1_path,
        interpret=interpret,
    )
    G_total = scales.shape[0]
    Gz = zeros.shape[0]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tk // 8, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G_total, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Gz, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * Kp * x2.dtype.itemsize
            + Kp * Np // 2
            + scales.size * 4
            + Mp * N * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(x2, data, scales, zeros)
    if out.shape[0] != M:
        out = out[:M]
    if out.shape[1] != N:
        out = out[:, :N]
    return out.reshape(*batch_shape, N)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tiles(M: int, N: int, K_eff: int, g: int):
    tm = min(_round_up(max(M, 1), 8), 256)
    # ragged N (Falcon's 4544/4672, vocab sizes) is PADDED to the tile by the
    # caller, so the wide tile is always legal — tn=128 halved effective
    # bandwidth on Falcon's attention projections
    tn = 256
    # K tile must be a multiple of the group size (and ideally of 128).
    base = max(g, 128)
    def whole_k_or_bail():
        # single K-step: scale offsets become STATIC (any alignment works)
        if K_eff % g == 0 and K_eff * max(tn, 256) <= 4 * 1024 * 1024:
            return tm, tn, K_eff
        return tm, tn, 0  # caller falls back to the XLA ref path

    if K_eff % base:
        # unfriendly K (e.g. Falcon's 4544, small encoder hiddens)
        return whole_k_or_bail()
    tk = base
    while tk * 2 <= 2048 and K_eff % (tk * 2) == 0:
        tk *= 2
    if (tk // g) % 8 and tk != K_eff:
        # multi-step grids dynamic-slice the scale rows, and Mosaic requires
        # provably 8-aligned row offsets — per-step group counts that are not
        # a multiple of 8 must run as one whole-K step instead
        return whole_k_or_bail()
    return tm, tn, tk


class _WoqMeta(NamedTuple):
    """Hashable static description of a QuantizedTensor + call options."""

    weight_dtype: str
    scheme: str
    group_size: int
    K: int
    N: int
    out_dtype: str
    interpret: Optional[bool]
    layout: str = "khalf"

    def rebuild(self, data, scales, zeros) -> QuantizedTensor:
        return QuantizedTensor(
            data=data,
            scales=scales,
            zeros=zeros,
            weight_dtype=self.weight_dtype,
            scheme=self.scheme,
            group_size=self.group_size,
            K=self.K,
            N=self.N,
            layout=self.layout,
        )


def _pallas_woq(x, qt: QuantizedTensor, out_dtype, interpret):
    """Dispatch to the Pallas kernel; fall back to ref on unfriendly shapes."""
    if interpret is None:
        interpret = use_pallas_interpret()

    batch_shape = x.shape[:-1]
    K = x.shape[-1]
    if K != qt.K:
        raise ValueError(f"x last dim {K} != quantized weight K {qt.K}")
    M = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    x2 = x.reshape(M, K)

    if qt.layout == "w32":
        return _pallas_woq_w32(x2, batch_shape, qt, out_dtype, interpret)

    g = qt.group_size
    N = qt.N
    compute_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16

    # Compute-bound regime (encoder batches / long prefill): decode the
    # weight ONCE per program into the MXU dtype and run a plain XLA matmul.
    # The Pallas kernel re-decodes each weight tile for every M block — the
    # right trade at decode shapes where HBM weight traffic dominates, pure
    # VPU waste once arithmetic intensity flips (~M≥1k the matmul is MXU
    # bound either way, and XLA hoists the loop-invariant dequant out of
    # surrounding batch loops entirely).
    if M >= 1024:
        w = dequantize(qt, dtype=compute_dtype)
        out = jnp.einsum(
            "mk,kn->mn", x2.astype(compute_dtype), w,
            preferred_element_type=compute_dtype,
        )
        return out.astype(out_dtype).reshape(*batch_shape, N)

    # f32 scale rows: bf16 refs have (16, 128) min tiles, which breaks the
    # odd-offset scale slices small models produce
    data, scales = qt.data, qt.scales.astype(jnp.float32)
    zeros = (
        jnp.zeros((1, N), jnp.float32)
        if qt.zeros is None
        else qt.zeros.astype(jnp.float32)
    )

    if qt.bits == 4:
        K2 = K // 2
        tm, tn, tk = _pick_tiles(M, N, K2, g)
        if tk == 0 or K2 % tk or tk % g:
            return woq_matmul_ref(x, qt, out_dtype)
        # pad ragged N (e.g. vocab sizes) to the tile; XLA hoists the pad out
        # of decode loops, and zero scale columns dequantize to zero
        Np = _round_up(N, tn)
        if Np != N:
            data = jnp.pad(data, ((0, 0), (0, Np - N)))
            scales = jnp.pad(scales, ((0, 0), (0, Np - N)))
            zeros = jnp.pad(zeros, ((0, 0), (0, Np - N)))
        Mp = _round_up(M, tm)
        if Mp != M:
            x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
        grid = (Mp // tm, Np // tn, K2 // tk)
        sg = tk // g  # scale rows per K-step
        G2 = K2 // g  # groups per half; hi scales start at block row G2 // sg

        cb = None
        if qt.is_codebook:
            cb = tuple(float(v) for v in get_codebook(qt.weight_dtype))

        kernel = functools.partial(
            _woq_kernel_4bit,
            group_size=g,
            num_k_steps=grid[2],
            groups_per_half=G2,
            scheme=qt.scheme,
            codebook=cb,
            compute_dtype=compute_dtype,
        )
        G_total = scales.shape[0]
        Gz = zeros.shape[0]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                # low/high-nibble activation K-slices, PRE-SPLIT so that a
                # whole-K block (unfriendly K like Falcon's 4544) is legal:
                # Pallas allows a block dim equal to the full array dim
                pl.BlockSpec(
                    (tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tk, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
                ),
                # all scale rows (small), column-blocked only
                pl.BlockSpec(
                    (G_total, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (Gz, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * Mp * N * K,
                bytes_accessed=Mp * K * x2.dtype.itemsize
                + K2 * N
                + qt.scales.size * qt.scales.dtype.itemsize
                + Mp * N * jnp.dtype(out_dtype).itemsize,
                transcendentals=0,
            ),
        )(x2[:, :K2], x2[:, K2:], data, scales, zeros)
    else:
        tm, tn, tk = _pick_tiles(M, N, K, g)
        if tk == 0 or K % tk or tk % g:
            return woq_matmul_ref(x, qt, out_dtype)
        Np = _round_up(N, tn)
        if Np != N:
            data = jnp.pad(data, ((0, 0), (0, Np - N)))
            scales = jnp.pad(scales, ((0, 0), (0, Np - N)))
            zeros = jnp.pad(zeros, ((0, 0), (0, Np - N)))
        Mp = _round_up(M, tm)
        if Mp != M:
            x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
        grid = (Mp // tm, Np // tn, K // tk)
        sg = tk // g
        kernel = functools.partial(
            _woq_kernel_8bit,
            group_size=g,
            num_k_steps=grid[2],
            scheme=qt.scheme,
            compute_dtype=compute_dtype,
        )
        G_total = scales.shape[0]
        Gz = zeros.shape[0]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tk, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (G_total, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (Gz, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * Mp * N * K,
                bytes_accessed=Mp * K * x2.dtype.itemsize + K * N,
                transcendentals=0,
            ),
        )(x2, data, scales, zeros)

    if out.shape[0] != M:
        out = out[:M]
    if out.shape[1] != N:
        out = out[:, :N]
    return out.reshape(*batch_shape, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _woq_core(meta: _WoqMeta, x, data, scales, zeros):
    qt = meta.rebuild(data, scales, zeros)
    return _pallas_woq(x, qt, jnp.dtype(meta.out_dtype), meta.interpret)


def _woq_core_fwd(meta, x, data, scales, zeros):
    out = _woq_core(meta, x, data, scales, zeros)
    return out, (x, data, scales, zeros)


def _woq_core_bwd(meta, res, gout):
    x, data, scales, zeros = res
    qt = meta.rebuild(data, scales, zeros)
    w = dequantize(qt, dtype=jnp.float32)
    dx = jnp.einsum(
        "...n,kn->...k",
        gout.astype(jnp.float32),
        w,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    d_data = np.zeros(data.shape, dtype=jax.dtypes.float0)
    d_scales = jnp.zeros_like(scales)
    d_zeros = None if zeros is None else jnp.zeros_like(zeros)
    return dx, d_data, d_scales, d_zeros


_woq_core.defvjp(_woq_core_fwd, _woq_core_bwd)


def woq_matmul(
    x: jax.Array,
    qt: QuantizedTensor,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x (..., K) @ dequant(qt) (K, N) → (..., N), Pallas fast path."""
    if qt.pre_scale is not None:
        # AWQ/TEQ/SmoothQuant activation folding: effective weight is
        # diag(pre_scale) @ W_stored, applied to x instead (one VPU multiply).
        x = x * qt.pre_scale.astype(x.dtype)
    meta = _WoqMeta(
        weight_dtype=qt.weight_dtype,
        scheme=qt.scheme,
        group_size=qt.group_size,
        K=qt.K,
        N=qt.N,
        out_dtype=jnp.dtype(out_dtype or x.dtype).name,
        interpret=interpret,
        layout=qt.layout,
    )
    return _woq_core(meta, x, qt.data, qt.scales, qt.zeros)


def woq_linear(
    x: jax.Array,
    qt: QuantizedTensor,
    bias: Optional[jax.Array] = None,
    out_dtype=None,
) -> jax.Array:
    """Linear layer on a quantized weight (reference: qbits.cpp:113 woq_linear)."""
    out = woq_matmul(x, qt, out_dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
