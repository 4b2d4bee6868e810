"""Probe: time the engine decode step (plain vs fused-horizon scan) with
device-resident inputs on the real chip, isolating kernel time from the
relay dispatch/upload overhead that bench_serving.py measures end-to-end."""

import time
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_gptj_int4 import build_params
from intel_extension_for_transformers_tpu.models.decoder import DecoderConfig
from intel_extension_for_transformers_tpu.models.engine import (
    _engine_step, _engine_step_multi, GuideState)
from intel_extension_for_transformers_tpu.models.llama import init_kv_cache

config = DecoderConfig.gptj_6b()
params = build_params(config, np.random.default_rng(0), group_size=128)
B, V, S = 8, config.vocab_size, 168

# exactly the engine's batched_cache construction (engine.py __init__)
base = init_kv_cache(config, 1, S)
cache = jax.tree.map(
    lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy()
    if hasattr(x, "shape") and x.ndim else jnp.zeros((B,), jnp.int32),
    base)
tokens = jnp.ones((B,), jnp.int32)
rng = jax.random.PRNGKey(0)
temp = jnp.ones((B,)); topk = jnp.zeros((B,), jnp.int32)
topp = jnp.ones((B,)); dos = jnp.zeros((B,), bool); rep = jnp.ones((B,))
seen = jnp.zeros((B, V), bool)
guide = GuideState(seqs=jnp.full((B, 1, 1), -1, jnp.int32),
                   active=jnp.zeros((B, 1), bool),
                   pos=jnp.zeros((B,), jnp.int32),
                   on=jnp.zeros((B,), bool))
accum = jnp.zeros((B, S), jnp.float32)

N = 20


def state():
    # fresh carries per run — the step jits DONATE cache/tokens/rng/seen/
    # guide/accum, so each call consumes its inputs; thread them through
    return (jax.tree.map(jnp.copy, cache), jnp.copy(tokens), jnp.copy(rng),
            jnp.copy(seen), jax.tree.map(jnp.copy, guide), jnp.copy(accum))


def run_single():
    c, t, r, s, g, a = state()
    t, c, r, s, g, a = _engine_step(params, config, c, t, r, temp, topk,
                                    topp, dos, rep, s, g, a)
    int(t[0])
    t0 = time.perf_counter()
    for _ in range(N):
        t, c, r, s, g, a = _engine_step(params, config, c, t, r, temp, topk,
                                        topp, dos, rep, s, g, a)
    int(t[0])
    print(f"single step: {(time.perf_counter()-t0)/N*1e3:.1f} ms/step",
          flush=True)


def run_multi(H):
    c, t, r, s, g, a = state()
    toks, t, c, r, s, g, a = _engine_step_multi(
        params, config, c, t, r, temp, topk, topp, dos, rep, s, g, a, H)
    int(toks[0, 0])
    t0 = time.perf_counter()
    for _ in range(N):
        toks, t, c, r, s, g, a = _engine_step_multi(
            params, config, c, t, r, temp, topk, topp, dos, rep, s, g, a, H)
    int(toks[0, 0])
    dt = (time.perf_counter() - t0) / N
    print(f"fused h{H}: {dt*1e3:.1f} ms/dispatch = {dt/H*1e3:.1f} ms/step",
          flush=True)


run_single()
for H in (4, 8):
    run_multi(H)
