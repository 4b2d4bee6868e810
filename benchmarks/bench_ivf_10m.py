"""IVF at 10M vectors on ONE chip: QPS / recall / memory per codec.

The scale point between the measured 300k (bench_ivf.py) and the 100M v5e-8
target of BASELINE.json configs[3]: a 10M×768 index fits a single chip's
HBM only through the residual codecs (int4 ≈ 0.3 GB/M padded, int8 ≈ 1 GB/M)
— bf16 raw (15.4 GB) does not, which is itself the design argument for the
codec menu. The corpus is generated ON the device in 1M chunks
(`synthetic.clustered_embeddings_device`): host generation + the ~30 MB/s
relay upload would cost hours for 30 GB; on-device it is seconds, and the
exact-top-k oracle accumulates incrementally over the same chunks.

    python benchmarks/bench_ivf_10m.py --dtypes int4 int8 [--n 10000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _retry(what, fn, tries=5, wait=30):
    """Retry transient relay faults. The first 12.5M max-rows build died at
    11.75M/12.5M (94%, ~45 min in) on a single 'response body closed'
    remote_compile read — the relay hiccups rarely but a multi-hour build
    must survive it. Only side-effect-free device calls go through here
    (generation, oracle top-k): retrying `idx.add` could double-insert and
    shift the oracle's row ids, so add is deliberately NOT wrapped."""
    for a in range(tries):
        try:
            return fn()
        except Exception as e:
            if a == tries - 1:
                raise
            print(f"[retry] {what}: {type(e).__name__}: {str(e)[:200]} — "
                  f"retry {a + 1}/{tries - 1} in {wait}s",
                  file=sys.stderr, flush=True)
            time.sleep(wait)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10_000_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--n-lists", type=int, default=4096)
    p.add_argument("--nprobe", type=int, nargs="+", default=[32, 16, 64])
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=100,
                   help="fori_loop iterations per timed dispatch. The "
                   "relay's ~26 ms round-trip floor rides on EVERY "
                   "dispatch: at iters=10 that is +2.6 ms/batch (the "
                   "round-4 numbers understated QPS ~1.7×); 100 puts the "
                   "floor under 3% of any measured point")
    p.add_argument("--eval-queries", type=int, default=64)
    p.add_argument("--dtypes", nargs="+", default=["int4", "int8"],
                   help="int4 | int8 | int4_refine (two-tier: int4 "
                   "hi-nibble scan + exact-int8 rescore, dense lo plane)")
    p.add_argument("--rescore-t", type=int, nargs="+", default=[16],
                   help="int4_refine: per-probed-list candidates kept by "
                   "the scan tier and re-scored exactly (a search-time "
                   "knob — every value sweeps on the SAME build)")
    p.add_argument("--rescore-r", type=int, nargs="+", default=[],
                   help="int4_refine: GLOBAL top-r candidate selection "
                   "across the probed union (the flat index's shadow "
                   "design) — sweeps on the same build; robust where "
                   "per-list quotas cliff on clustered data")
    p.add_argument("--group-size", type=int, default=32,
                   help="residual codec scale granularity")
    p.add_argument("--cap-ratio", type=float, default=1.5,
                   help="hard list cap as a multiple of the mean fill; "
                   "int8 at 10M needs ~1.35 to fit the padded block table "
                   "in 16 GB HBM next to a 3 GB generation chunk")
    p.add_argument("--single", action="store_true")
    p.add_argument("--constrained", action="store_true",
                   help="capacity-constrained Lloyd training (halves list "
                   "skew on clustered data → fewer spill drops)")
    p.add_argument("--hierarchical", type=int, default=0,
                   help="two-level mass-proportional quantizer with this "
                   "many level-1 regions (-1 = C//8); kills the flat-Lloyd "
                   "mass tail that drop-limits recall at 10M")
    p.add_argument("--train-n", type=int, default=200_000)
    p.add_argument("--chunk", type=int, default=500_000,
                   help="device generation chunk; shrink when the packed "
                   "table leaves less HBM headroom (int8 at 8k lists)")
    p.add_argument("--state-dir", default=None,
                   help="save the built index + oracle there (or load them "
                   "if present) so a flaky search-phase compile does not "
                   "force a rebuild")
    args = p.parse_args()

    if not args.single and len(args.dtypes) > 1:
        # one codec per subprocess: HBM frees reliably only at process exit
        import subprocess

        results = {}
        for dt in args.dtypes:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--single", "--dtypes", dt]
            for k in ("n", "dim", "n_lists", "nprobe", "batch", "iters",
                      "eval_queries", "cap_ratio", "state_dir", "train_n",
                      "chunk", "rescore_t", "rescore_r", "group_size"):
                v = getattr(args, k)
                if v is None or v == []:
                    continue
                vals = v if isinstance(v, list) else [v]
                cmd += [f"--{k.replace('_', '-')}"] + [str(x) for x in vals]
            if args.constrained:
                cmd += ["--constrained"]
            if args.hierarchical:
                cmd += ["--hierarchical", str(args.hierarchical)]
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=14400)
            sys.stderr.write(r.stderr[-3000:])
            if r.returncode == 0 and r.stdout.strip():
                out = json.loads(r.stdout.strip().splitlines()[-1])
                results[dt] = out["detail"][dt]
        best = (results.get("int4_refine") or results.get("int4")
                or next(iter(results.values())))
        print(json.dumps({
            "metric": (f"ivf10m_qps_n{args.n}_d{args.dim}"
                       f"_nprobe{args.nprobe[0]}"),
            "value": best["qps"],
            "unit": "qps",
            "detail": results,
        }))
        return

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from intel_extension_for_transformers_tpu.retrieval import IVFIndex
    from intel_extension_for_transformers_tpu.retrieval.ivf import (
        _auto_query_chunk,
        _ivf_search_coded,
    )
    from intel_extension_for_transformers_tpu.retrieval.synthetic import (
        clustered_embeddings_device,
    )

    dt = args.dtypes[0]
    NQ = args.eval_queries
    # 500k chunks: generation transients (~3 copies of the chunk inside the
    # jitted sampler) + the packed block table + one live chunk must all fit
    # 16 GB HBM next to each other
    CHUNK = min(args.chunk, args.n)

    # corpus generated ON the device: 10M×768 f32 host generation costs
    # ~5 min/M rows on this one-core host plus ~100 s/M rows through the
    # ~30 MB/s TPU relay — the previous host-side version of this bench hit
    # a 4 h timeout on exactly that. Queries + the training sample come
    # from the same distribution/seed.
    first, queries = clustered_embeddings_device(
        CHUNK, dim=args.dim, n_queries=max(NQ, args.batch),
        n_topics=256, seed=0,
    )
    qd = queries[:NQ]

    state = (os.path.join(args.state_dir, f"ivf10m_{dt}_{args.n}")
             if args.state_dir else None)
    if state and os.path.exists(state + ".oracle.npz"):
        print(f"[{dt}] loading saved index from {state}", file=sys.stderr,
              flush=True)
        idx = IVFIndex.load(state)
        saved = np.load(state + ".oracle.npz")
        best_i, build_s = saved["best_i"], float(saved["build_s"])
        idx.dropped = int(saved["dropped"])
        run_search_phase(args, dt, idx, qd, queries, best_i, build_s)
        return

    # bounded-memory build: hard list cap at 1.5× the mean + the 4-way
    # spill cascade (retrieval/ivf.py _plan_insert_capped) — memory is
    # C·cap by construction, no growth re-layout can spike HBM; measured
    # drop rate ~1% on clustered data at this cap
    cap = int(np.ceil(args.cap_ratio * args.n / args.n_lists))
    if dt == "int4_refine":
        idx = IVFIndex(dim=args.dim, n_lists=args.n_lists, dtype="int4",
                       refine="int8", refine_capacity=args.n,
                       list_cap=cap, group_size=args.group_size, spill=True)
    else:
        idx = IVFIndex(dim=args.dim, n_lists=args.n_lists, dtype=dt,
                       list_cap=cap, group_size=args.group_size, spill=True)
    t0 = time.time()
    train_n = min(args.train_n, len(first))
    if args.hierarchical:
        kw = dict(hierarchical=(True if args.hierarchical < 0
                                else args.hierarchical))
    elif args.constrained:
        kw = dict(constrained=True)
    else:
        kw = dict(balance_ratio=1.3, balance_rounds=8)
    idx.train(first[:train_n], iters=6, **kw)
    print(f"[{dt}] trained in {time.time()-t0:.0f}s; hard list cap {cap} "
          f"(avg {args.n // args.n_lists})", file=sys.stderr, flush=True)

    # top-10 oracle accumulates per chunk on device: scores (NQ, chunk)
    @jax.jit
    def chunk_topk(qd, chunk):
        s = qd @ chunk.T  # (NQ, M) f32
        sc, ii = jax.lax.top_k(s, 10)
        return sc, ii

    best_s = np.full((NQ, 10), -1e9, np.float32)
    best_i = np.zeros((NQ, 10), np.int64)

    added = 0
    rng_seed = 1
    chunk = None
    while added < args.n:
        if added == 0:
            chunk, first = first, None  # drop the extra 1.5 GB reference
        else:
            chunk = None  # free the previous chunk BEFORE generating
            chunk, _ = _retry("chunk generation", lambda: (
                clustered_embeddings_device(
                    min(CHUNK, args.n - added), dim=args.dim, n_queries=1,
                    n_topics=256, seed=rng_seed,
                )))
            rng_seed += 1
        chunk = chunk[: args.n - added]

        def _oracle():
            s, i2 = chunk_topk(qd, chunk)
            return np.asarray(s), np.asarray(i2)

        sc, ii = _retry("oracle top-k", _oracle)
        ii = ii.astype(np.int64) + added
        merged_s = np.concatenate([best_s, sc], axis=1)
        merged_i = np.concatenate([best_i, ii], axis=1)
        ordr = np.argsort(-merged_s, axis=1)[:, :10]
        best_s = np.take_along_axis(merged_s, ordr, axis=1)
        best_i = np.take_along_axis(merged_i, ordr, axis=1)
        for j in range(0, len(chunk), 100_000):
            idx.add(chunk[j:j + 100_000])
        added += len(chunk)
        print(f"[{dt}] added {added:,}/{args.n:,} "
              f"(cap {idx._list_cap}, {time.time()-t0:.0f}s)",
              file=sys.stderr, flush=True)
    build_s = time.time() - t0

    if state:
        # NOTE: at 10M int8 the save is a ~12 GB device→host readback —
        # measured 45+ min through this machine's relay with nothing
        # written; only use --state-dir on directly-attached chips
        os.makedirs(args.state_dir, exist_ok=True)
        print(f"[{dt}] saving index+oracle to {state} (device→host "
              "readback; slow through a relay)", file=sys.stderr, flush=True)
        idx.save(state)
        np.savez(state + ".oracle.npz", best_i=best_i, build_s=build_s,
                 dropped=idx.dropped)
        print(f"[{dt}] saved", file=sys.stderr, flush=True)
    run_search_phase(args, dt, idx, qd, queries, best_i, build_s)


def run_search_phase(args, dt, idx, qd, queries, best_i, build_s):
    """QPS/recall per nprobe through the FUSED Pallas scan (ops/ivf_scan.py)
    — the XLA coded path OOM'd 16 GB HBM at this scale even at batch 8
    (~14 B of decode temps per candidate element); the kernel decodes in
    VMEM and reads each probed list's packed block once per batch."""
    import jax
    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.ops.ivf_scan import (
        ivf_scan_topk,
    )

    NQ = args.eval_queries
    print(f"[{dt}] search phase: kernel layout + recall eval",
          file=sys.stderr, flush=True)
    idx._ensure_kernel_layout()
    C, L = idx.n_lists, idx._list_cap
    fills = np.asarray((idx._row_ids.reshape(C, L) >= 0).sum(axis=1))
    print(f"[{dt}] list fill: mean {fills.mean():.0f} max {fills.max()} "
          f"full {(fills >= L).sum()}/{C} dropped {idx.dropped:,}",
          file=sys.stderr, flush=True)
    # DONATING reshapes: an eager jnp reshape dispatches a copy — 10.3 GB
    # of table next to itself OOM'd the chip here. Donation lets XLA alias
    # the same-size bitcast, so the 3D views cost zero HBM; the flat
    # handles on idx are dropped (search phase owns the arrays from here).
    W = idx._storage.shape[-1]
    G = idx._scales.shape[-1]
    storage3 = jax.jit(lambda x: x.reshape(C, L, W),
                       donate_argnums=0)(idx._storage)
    idx._storage = None
    scales3 = jax.jit(lambda x: x.reshape(C, L, G),
                      donate_argnums=0)(idx._scales)
    idx._scales = None
    rids2 = idx._row_ids.reshape(C, L)  # 50 MB — a copy is fine
    cent = idx.centroids
    refine = getattr(idx, "refine", None)
    lo = None
    if refine:
        from intel_extension_for_transformers_tpu.ops.ivf_scan import (
            ivf_scan_candidates,
        )
        from intel_extension_for_transformers_tpu.retrieval.ivf import (
            _rescore_refine,
        )

        lo = idx._lo  # dense (n, W) by row id, or padded (C·L, W)
        idx._lo = None
        lo_dense = idx._lo_dense

        import functools

        @functools.partial(jax.jit,
                           static_argnames=("nprobe", "t_res", "r_res"))
        def _refine_one(qb, cent, storage, scales, row_ids, lo_plane, *,
                        nprobe, t_res=None, r_res=None):
            # reshapes inside jit = free bitcasts (eager ones COPY — the
            # round-4 OOM lesson)
            csims = qb @ cent.T.astype(jnp.float32)
            _, probes = jax.lax.top_k(csims, nprobe)
            if r_res is not None:  # global top-r candidate selection
                _, pos = ivf_scan_topk(
                    qb, cent, storage, scales, row_ids, probes,
                    k=r_res, bits=4, group_size=idx.group_size,
                    l_blk=idx._l_blk, track_positions=True,
                    code_mult=16, code_offset=8,
                )
            else:  # per-probed-list top-t quota
                _, pos = ivf_scan_candidates(
                    qb, cent, storage, scales, row_ids, probes,
                    t=t_res, bits=4, group_size=idx.group_size,
                    l_blk=idx._l_blk, code_mult=16, code_offset=8,
                )
            return _rescore_refine(
                qb, cent, storage.reshape(C * L, W), lo_plane,
                scales.reshape(C * L, G), row_ids.reshape(-1), pos, k=10,
                group_size=idx.group_size, list_cap=L, lo_dense=lo_dense,
            )

    max_id = args.n if args.n < 2**24 else None  # f32-exact compacted merge

    def kernel_search(qb, nprobe, t_res, r_res):
        qb = jnp.asarray(qb, jnp.float32)
        if refine:
            return _refine_one(qb, cent, storage3, scales3, rids2, lo,
                               nprobe=nprobe, t_res=t_res, r_res=r_res)
        csims = qb @ cent.T.astype(jnp.float32)
        _, probes = jax.lax.top_k(csims, nprobe)
        return ivf_scan_topk(
            qb, cent, storage3, scales3, rids2, probes,
            k=10, bits=idx._bits, group_size=idx.group_size,
            l_blk=idx._l_blk, max_id=max_id,
        )

    q = jnp.asarray(queries[: args.batch], jnp.float32)
    # roofline inputs: bytes the scan MUST move per batch (probed-list
    # union × packed row bytes) + the refine tier's candidate gathers —
    # computable from the index layout alone (judge round-4 ask #5). The
    # machine DMA floor is this machine's measured ~310 GB/s effective HBM
    # read bandwidth (CLAUDE.md ceilings).
    DMA_GBPS = 310e9
    probes_np = np.argsort(
        -(np.asarray(q) @ np.asarray(cent).T), axis=1
    )
    points = {}
    if refine:
        combos = ([("t", t) for t in args.rescore_t]
                  + [("r", r) for r in args.rescore_r])
    else:
        combos = [(None, None)]
    for mode, val in combos:
        t_res = val if mode == "t" else None
        r_res = val if mode == "r" else None
        for nprobe in args.nprobe:
            hits = 0
            for j in range(0, NQ, args.batch):
                _, ids = kernel_search(qd[j:j + args.batch], nprobe,
                                       t_res, r_res)
                ids = np.asarray(ids)
                for r, row in enumerate(ids):
                    hits += len(
                        set(row.tolist()) & set(best_i[j + r].tolist())
                    )
            rec = hits / (NQ * 10)

            # fused-loop QPS (arguments, not closure constants — 413 rule)
            @jax.jit
            def loop(qq, cent, storage, scales, row_ids, lo_plane):
                def body(i, acc):
                    qi = qq + 0 * i.astype(qq.dtype)
                    if refine:
                        _, ii = _refine_one.__wrapped__(
                            qi, cent, storage, scales, row_ids, lo_plane,
                            nprobe=nprobe, t_res=t_res, r_res=r_res,
                        )
                    else:
                        csims = qi @ cent.T.astype(jnp.float32)
                        _, probes = jax.lax.top_k(csims, nprobe)
                        _, ii = ivf_scan_topk(
                            qi, cent, storage, scales, row_ids, probes,
                            k=10, bits=idx._bits, group_size=idx.group_size,
                            l_blk=idx._l_blk, max_id=max_id,
                        )
                    return acc + ii[0, 0]

                return jax.lax.fori_loop(0, args.iters, body, jnp.int32(0))

            lo_arg = lo if refine else jnp.zeros((1, 1), jnp.int8)
            operands = (q, cent, storage3, scales3, rids2, lo_arg)
            int(loop(*operands))
            t0 = time.perf_counter()
            int(loop(*operands))
            dt_s = time.perf_counter() - t0
            qps = args.batch * args.iters / dt_s

            # roofline: probed-union scan + refine gather bytes per batch
            uniq = len(np.unique(probes_np[:, :nprobe]))
            row_bytes = W + 2 * G + 4  # packed + bf16 scales + row id
            scan_bytes = uniq * L * row_bytes
            gather_bytes = 0
            key = f"nprobe{nprobe}"
            if refine:
                # hi + lo + scales + rid per candidate row (row gathers)
                n_cand = (nprobe * t_res) if mode == "t" else r_res
                gather_bytes = args.batch * n_cand * (2 * W + 2 * G + 4)
                key = f"nprobe{nprobe}_{mode}{val}"
            bound_qps = args.batch / ((scan_bytes + gather_bytes) / DMA_GBPS)
            points[key] = {
                "qps": round(qps, 1),
                "recall@10": round(float(rec), 4),
                "dma_bound_qps": round(bound_qps, 1),
                "dma_pct": round(100 * qps / bound_qps, 1),
            }
            print(f"[{dt}] {key}: {points[key]} "
                  f"(union {uniq} lists, {scan_bytes/1e6:.0f} MB scan "
                  f"+ {gather_bytes/1e6:.0f} MB gather / batch)",
                  file=sys.stderr, flush=True)

    mem = (storage3.size * storage3.dtype.itemsize
           + scales3.size * scales3.dtype.itemsize
           + rids2.size * 4 + cent.size * 4
           + (lo.size * lo.dtype.itemsize if lo is not None else 0))
    top_key = (f"nprobe{args.nprobe[0]}_t{args.rescore_t[0]}"
               if refine else f"nprobe{args.nprobe[0]}")
    top = points[top_key]
    detail = {dt: {
        **top,
        "memory_gb": round(mem / 1e9, 2),
        "build_s": round(build_s, 1),
        "list_cap": idx._list_cap,
        "dropped": idx.dropped,
        "points": points,
    }}
    print(f"[{dt}] {detail[dt]}", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": f"ivf10m_qps_n{args.n}_d{args.dim}_nprobe{args.nprobe[0]}",
        "value": detail[dt]["qps"],
        "unit": "qps",
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
