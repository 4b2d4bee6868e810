"""Kernel-level IVF scan profiling on a synthetic packed layout.

Times `ops/ivf_scan.ivf_scan_topk` directly — no 20-minute index build —
to locate the gap between measured QPS and the pure-DMA roofline that
`bench_ivf_10m.py` prints (round-5: int8 10M runs at 34-46% of the DMA
bound). Sweeps the sub-block size (`l_blk`), batch size, and nprobe so
the per-grid-step overhead and the batch-fixed overhead (coarse scoring,
probe compaction, final merge) separate:

    time(batch) ≈ fixed + steps(nprobe) · (DMA(l_blk) + step_overhead)

The layout is random int8 (scores are meaningless; DMA/compute cost is
shape-only), generated on device. cap is chosen so every candidate
l_blk divides L_pad and the SAME arrays serve all sweeps.

    python benchmarks/profile_ivf_scan.py --c 2048 --cap 1536 \
        --l-blk 384 768 1536 --nprobe 1 8 16 --batch 64
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--c", type=int, default=2048, help="n_lists")
    p.add_argument("--cap", type=int, default=1536, help="padded list cap")
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--bits", type=int, default=8, choices=[4, 8])
    p.add_argument("--group-size", type=int, default=32)
    p.add_argument("--batch", type=int, nargs="+", default=[64])
    p.add_argument("--nprobe", type=int, nargs="+", default=[1, 8, 16])
    p.add_argument("--l-blk", type=int, nargs="+", default=[768])
    p.add_argument("--m-rows", type=int, nargs="+", default=[8])
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--prologue", action="store_true",
                   help="time ONLY the wrapper prologue (coarse scoring + "
                   "top-k probe selection + duplicate compaction), no scan")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from intel_extension_for_transformers_tpu.ops.ivf_scan import (
        ivf_scan_topk,
    )

    C, L, D = args.c, args.cap, args.dim
    W = D // 2 if args.bits == 4 else D
    G = D // args.group_size
    for lb in args.l_blk:
        assert L % lb == 0, (L, lb)

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # chunked fill with donation: a one-shot randint of (C, L, W) carries a
    # 4× int32 intermediate (38 GB at the 10M-scale layout) — generate 512
    # lists at a time into a donated buffer instead
    CH = min(512, C)
    assert C % CH == 0

    @functools.partial(jax.jit, donate_argnums=0)
    def _fill(buf, key, i):
        r = jax.random.randint(key, (CH, L, W), -127, 128,
                               jnp.int32).astype(jnp.int8)
        return jax.lax.dynamic_update_slice(buf, r, (i, 0, 0))

    if args.prologue:
        storage = jnp.zeros((1, L, W), jnp.int8)  # unused in prologue mode
    else:
        storage = jnp.zeros((C, L, W), jnp.int8)
        for j in range(0, C, CH):
            storage = _fill(storage, jax.random.fold_in(k1, j),
                            jnp.int32(j))
    scales = (jax.random.uniform(k2, (C, L, G), jnp.float32, 0.01, 0.03)
              .astype(jnp.bfloat16))
    row_ids = jnp.arange(C * L, dtype=jnp.int32).reshape(C, L)
    cent = jax.random.normal(k3, (C, D), jnp.float32)
    maxB = max(args.batch)
    qall = jax.random.normal(k4, (maxB, D), jnp.float32)
    n_rows = C * L  # all slots valid → max_id for the compacted merge
    row_bytes = W + 2 * G + 4
    DMA_GBPS = 310e9

    results = {}
    for B in args.batch:
        q = qall[:B]
        csims_np = np.asarray(q) @ np.asarray(cent).T
        for nprobe in args.nprobe:
            probes_np = np.argsort(-csims_np, axis=1)[:, :nprobe]
            uniq = len(np.unique(probes_np))
            if args.prologue:
                from intel_extension_for_transformers_tpu.ops.ivf_scan \
                    import _compact_probes

                @jax.jit
                def loop_pro(qq, cent):
                    def body(i, acc):
                        qi = qq + 0 * i.astype(qq.dtype)
                        cs = qi @ cent.T
                        _, probes = jax.lax.top_k(cs, nprobe)
                        ul, member, base, live = _compact_probes(
                            probes, cs, B)
                        return (acc + ul[0] + member[0, 0, 0]
                                + base[0, 0, 0].astype(jnp.int32)
                                + live[0])

                    return jax.lax.fori_loop(
                        0, args.iters, body, jnp.int32(0))

                int(loop_pro(q, cent))
                t0 = time.perf_counter()
                int(loop_pro(q, cent))
                dt_s = time.perf_counter() - t0
                key_s = f"B{B}_np{nprobe}_prologue"
                results[key_s] = {
                    "per_batch_us": round(dt_s / args.iters * 1e6, 1),
                    "uniq_lists": uniq,
                }
                print(f"{key_s}: {results[key_s]}", file=sys.stderr,
                      flush=True)
                continue
            for lb in args.l_blk:
                for mr in args.m_rows:
                    @jax.jit
                    def loop(qq, cent, storage, scales, row_ids):
                        def body(i, acc):
                            qi = qq + 0 * i.astype(qq.dtype)
                            cs = qi @ cent.T
                            _, probes = jax.lax.top_k(cs, nprobe)
                            _, ii = ivf_scan_topk(
                                qi, cent, storage, scales, row_ids,
                                probes, k=args.k, bits=args.bits,
                                group_size=args.group_size, l_blk=lb,
                                max_id=n_rows, m_rows=mr,
                            )
                            return acc + ii[0, 0]

                        return jax.lax.fori_loop(
                            0, args.iters, body, jnp.int32(0))

                    ops = (q, cent, storage, scales, row_ids)
                    int(loop(*ops))  # compile + warm
                    t0 = time.perf_counter()
                    int(loop(*ops))
                    dt_s = time.perf_counter() - t0
                    per_batch_us = dt_s / args.iters * 1e6
                    steps = (B * nprobe) * (L // lb)  # incl. dead tail
                    live_steps = uniq * (L // lb)
                    scan_bytes = uniq * L * row_bytes
                    dma_us = scan_bytes / DMA_GBPS * 1e6
                    key_s = f"B{B}_np{nprobe}_lb{lb}_mr{mr}"
                    results[key_s] = {
                        "per_batch_us": round(per_batch_us, 1),
                        "qps": round(B * args.iters / dt_s, 1),
                        "uniq_lists": uniq,
                        "live_steps": live_steps,
                        "grid_steps": steps,
                        "dma_us": round(dma_us, 1),
                        "us_per_live_step": round(
                            per_batch_us / max(live_steps, 1), 2),
                        "dma_pct": round(100 * dma_us / per_batch_us, 1),
                    }
                    print(f"{key_s}: {results[key_s]}", file=sys.stderr,
                          flush=True)

    print(json.dumps({"metric": "ivf_scan_profile", "value": 0,
                      "unit": "us", "detail": results}))


if __name__ == "__main__":
    main()
