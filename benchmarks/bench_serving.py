"""Continuous-batching SERVING throughput: tokens/s through the engine.

The reference's serving numbers are per-step kernel latencies (BASELINE.md
next-token tables); a serving engine also pays per-dispatch host overhead —
~30 ms through this machine's TPU relay, 100s of µs of Python host loop on
a directly-attached chip (the reason vLLM grew multi-step scheduling).
`decode_horizon` fuses K pool decode steps into ONE program (lax.scan in
models/engine.py), so this benchmark measures the end-to-end effect: S
concurrent greedy streams, wall clock from submit to completion, with and
without the horizon.

    python benchmarks/bench_serving.py [--arch gptj] [--slots 8]
                                       [--horizon 8] [--tokens 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_gptj_int4 import build_params  # noqa: E402 — shared builder


def run_engine(params, config, *, slots, horizon, tokens, prompt_len,
               max_admissions=2):
    from intel_extension_for_transformers_tpu.models.engine import (
        DecodeEngine,
        EngineRequest,
    )

    eng = DecodeEngine(
        params, config,
        max_slots=slots, max_len=prompt_len + tokens + max(8, horizon),
        prefill_chunk=64, decode_horizon=horizon,
        max_admissions=max_admissions,
    ).start()
    try:
        # warmup: compiles prefill, first-token, and the decode program
        list(eng.submit(EngineRequest(
            np.arange(1, prompt_len + 1, dtype=np.int32),
            max_new_tokens=2 * horizon,
        )).tokens())

        reqs = [
            EngineRequest(
                np.arange(1, prompt_len + 1, dtype=np.int32) + i,
                max_new_tokens=tokens,
            )
            for i in range(slots)
        ]
        t0 = time.perf_counter()
        for r in reqs:
            eng.submit(r)
        outs = [list(r.tokens()) for r in reqs]
        dt = time.perf_counter() - t0
        n_tok = sum(len(o) for o in outs)
        assert n_tok == slots * tokens, (n_tok, slots, tokens)
        return {
            "tok_s": round(n_tok / dt, 1),
            "ms_per_token_per_stream": round(dt * 1e3 * slots / n_tok, 3),
            "wall_s": round(dt, 3),
            "dispatches": eng._steps,
        }
    finally:
        eng.stop()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="gptj", choices=["gptj", "mpt", "falcon"])
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--horizon", type=int, default=8)
    p.add_argument("--tokens", type=int, default=128)
    p.add_argument("--prompt-len", type=int, default=32)
    p.add_argument("--skip-h1", action="store_true",
                   help="skip the horizon=1 comparison run")
    p.add_argument("--max-admissions", type=int, default=2,
                   help="concurrent in-flight admissions; coarse horizons "
                   "want it ≈ slots so a wave of arrivals is admitted "
                   "within one burst boundary")
    args = p.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from intel_extension_for_transformers_tpu.models.decoder import (
        DecoderConfig,
    )

    config = {
        "gptj": DecoderConfig.gptj_6b,
        "mpt": DecoderConfig.mpt_7b,
        "falcon": DecoderConfig.falcon_7b,
    }[args.arch]()
    gs = next(
        g for g in (128, 64, 32)
        if (config.hidden_size // 2) % g == 0
        and (config.intermediate_size // 2) % g == 0
    )
    t0 = time.time()
    params = build_params(config, np.random.default_rng(0), group_size=gs)
    print(f"built int4 {args.arch} in {time.time()-t0:.0f}s", file=sys.stderr)

    detail = {}
    kw = dict(slots=args.slots, tokens=args.tokens,
              prompt_len=args.prompt_len,
              max_admissions=args.max_admissions)
    if not args.skip_h1:
        detail["h1"] = run_engine(params, config, horizon=1, **kw)
        print(f"h1: {detail['h1']}", file=sys.stderr, flush=True)
    detail[f"h{args.horizon}"] = run_engine(
        params, config, horizon=args.horizon, **kw
    )
    print(f"h{args.horizon}: {detail[f'h{args.horizon}']}",
          file=sys.stderr, flush=True)

    best = detail[f"h{args.horizon}"]
    print(json.dumps({
        "metric": f"{args.arch}_int4_serving_throughput_s{args.slots}",
        "value": best["tok_s"],
        "unit": "tok/s",
        "vs_baseline": (
            round(best["tok_s"] / detail["h1"]["tok_s"], 2)
            if "h1" in detail else None
        ),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
