"""Benchmark API: latency/throughput measurement on TPU.

Re-creation of the reference's benchmark surface
(reference: transformers/benchmark.py:28-90 multi-instance INC benchmark +
`BenchmarkConfig` transformers/config.py:148 + utils/get_throughput.py).

TPU methodology (differs from the reference's multi-process CPU instances by
necessity): the chip is reached through a network relay whose per-dispatch
latency can exceed kernel time, so hot loops are timed as MANY iterations
inside ONE jitted lax.fori_loop program ("fused" timing) and wall time is
divided by the iteration count. Multi-instance throughput parallelism is
subsumed by batching: one SPMD program with a bigger batch IS the TPU
analogue of N weight-sharing processes (SURVEY.md §2.3).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class BenchmarkConfig:
    """(reference: transformers/config.py:148)"""

    batch_size: int = 1
    seq_len: int = 128
    num_of_instance: int = 1  # parity knob; folded into batch on TPU
    warmup: int = 3
    iteration: int = 20
    generate_tokens: int = 32
    kwargs: Dict[str, Any] = field(default_factory=dict)


@dataclass
class BenchmarkResult:
    latency_ms: float
    p50_ms: float
    p90_ms: float
    p99_ms: float
    throughput: float  # items/s (meaning depends on workload)
    unit: str = "samples/s"

    def summary(self) -> str:
        return (
            f"latency {self.latency_ms:.3f} ms (p50 {self.p50_ms:.3f} "
            f"p90 {self.p90_ms:.3f} p99 {self.p99_ms:.3f}), "
            f"throughput {self.throughput:,.1f} {self.unit}"
        )


def benchmark_callable(
    fn: Callable[[], Any],
    warmup: int = 3,
    iteration: int = 20,
    items_per_call: float = 1.0,
    unit: str = "samples/s",
) -> BenchmarkResult:
    """Generic timer: fn() must block until results are ready."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iteration):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1e3)
    arr = np.asarray(times)
    mean = float(arr.mean())
    return BenchmarkResult(
        latency_ms=mean,
        p50_ms=float(np.percentile(arr, 50)),
        p90_ms=float(np.percentile(arr, 90)),
        p99_ms=float(np.percentile(arr, 99)),
        throughput=items_per_call / (mean / 1e3),
        unit=unit,
    )


def benchmark_fused(
    step_fn: Callable[[Any, Any], Any],
    init_state: Any,
    iters: int = 100,
    warmup: bool = True,
    items_per_iter: float = 1.0,
    unit: str = "items/s",
) -> BenchmarkResult:
    """Time `iters` applications of step_fn inside ONE jitted fori_loop —
    immune to per-dispatch relay latency. step_fn(i, state) → state must be
    shape-stable."""

    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, iters, step_fn, state)

    out = run(init_state)  # compile + warmup run
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(init_state)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    per = dt / iters * 1e3
    return BenchmarkResult(
        latency_ms=per,
        p50_ms=per,
        p90_ms=per,
        p99_ms=per,
        throughput=items_per_iter / (per / 1e3),
        unit=unit,
    )


def benchmark_generation(
    params,
    model_config,
    config: Optional[BenchmarkConfig] = None,
) -> Dict[str, BenchmarkResult]:
    """Decode-path benchmark: prefill latency + per-token decode throughput
    (the reference's first-token / next-token split, docs/release_data.md)."""
    from intel_extension_for_transformers_tpu.models.llama import init_kv_cache
    from intel_extension_for_transformers_tpu.models.registry import get_apply_fn

    llama_apply = get_apply_fn(model_config)  # works for every decoder family
    cfg = config or BenchmarkConfig()
    B, T = cfg.batch_size, cfg.seq_len
    S = T + cfg.generate_tokens
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, model_config.vocab_size, (B, T)),
        jnp.int32,
    )

    @jax.jit
    def prefill(params, ids):  # params as an ARGUMENT, never a captured const
        cache = init_kv_cache(model_config, B, S)
        logits, cache = llama_apply(params, model_config, ids, cache)
        return logits[:, -1], cache

    logits, cache0 = prefill(params, ids)
    float(logits[0, 0])  # scalar readback: block_until_ready can lie via relays

    # first-token latency: R prefills fused in ONE program so the ~30 ms
    # relay dispatch overhead amortizes away (matters at short prompts);
    # ids perturbation per iteration defeats loop-invariant hoisting
    R = max(2, min(32, 2048 // max(T, 1)))

    @jax.jit
    def prefill_rep(params, ids):
        def body(i, acc):
            ids_i = ids.at[0, 0].set(
                (ids[0, 0] + i) % model_config.vocab_size
            )
            cache = init_kv_cache(model_config, B, S)
            logits, _ = llama_apply(params, model_config, ids_i, cache)
            return acc + logits[0, -1, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    float(prefill_rep(params, ids))  # compile + warm
    t0 = time.perf_counter()
    float(prefill_rep(params, ids))  # scalar readback drains the chain
    per_prefill = (time.perf_counter() - t0) / R * 1e3
    prefill_res = BenchmarkResult(
        latency_ms=per_prefill, p50_ms=per_prefill, p90_ms=per_prefill,
        p99_ms=per_prefill, throughput=B * T / (per_prefill / 1e3),
        unit="prefill tokens/s",
    )

    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    @jax.jit
    def decode_loop(params, tok, cache):
        def step(i, state):
            tok, cache = state
            logits, cache = llama_apply(params, model_config, tok[:, None], cache)
            return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

        return jax.lax.fori_loop(0, cfg.generate_tokens, step, (tok, cache))

    out = decode_loop(params, tok0, cache0)  # compile + warmup
    _ = int(out[0][0])  # scalar readback: fully drain before timing
    t0 = time.perf_counter()
    out = decode_loop(params, tok0, cache0)
    _ = int(out[0][0])  # the final token depends on every step → full sync
    dt = time.perf_counter() - t0
    per = dt / cfg.generate_tokens * 1e3
    decode_res = BenchmarkResult(
        latency_ms=per, p50_ms=per, p90_ms=per, p99_ms=per,
        throughput=B / (per / 1e3), unit="decode tokens/s",
    )
    return {"prefill": prefill_res, "decode": decode_res}


def benchmark_encoder(
    params,
    model_config,
    config: Optional[BenchmarkConfig] = None,
) -> BenchmarkResult:
    """Embedding-encode throughput (the reference's BGE MTEB deployment
    number, examples/.../mteb/bge)."""
    from intel_extension_for_transformers_tpu.models.bert import bert_encode

    cfg = config or BenchmarkConfig()
    B, T = cfg.batch_size, cfg.seq_len
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, model_config.vocab_size, (B, T)),
        jnp.int32,
    )
    mask = jnp.ones((B, T), jnp.int32)

    def run():
        return jax.block_until_ready(
            bert_encode(params, model_config, ids, mask)
        )

    run()
    return benchmark_callable(
        run,
        warmup=cfg.warmup,
        iteration=cfg.iteration,
        items_per_call=B,
        unit="sentences/s",
    )
