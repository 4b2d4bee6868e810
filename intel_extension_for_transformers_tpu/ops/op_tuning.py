"""Per-shape WOQ kernel-layout auto-tuner with a persisted dispatch table.

TPU-native analogue of the reference Neural Engine's kernel-tuning pass: in
TUNING mode the reference benchmarks kernel alternatives per op and writes a
dispatch table that INFERENCE mode replays (reference
`transformers/runtime/executor/src/op_tuning.cpp`,
`src/dispatcher.cpp:52-80`, `include/dispatch_table.hpp`). Here the
alternatives are the two int4 decode layouts — "khalf" (default nibble
half-split) and "w32" (bf16 bit-pattern decode,
`ops/packing.to_decode_layout`) — measured per weight shape with relay-safe
differential timing and persisted as JSON keyed by
(weight_dtype, scheme, group_size, K, N, M).

Measured motivation (BENCHMARKS.md "Kernels"): at M=1 the w32 layout hits
402 GB/s (130% of the streaming floor) on the GPT-J up-projection shape but
is at-or-below khalf on most others — so a whole-tree repack
(`packing.prepare_for_inference`) loses on net, while a per-shape dispatch
table captures the wins and keeps the default elsewhere.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

from .packing import QuantizedTensor, from_decode_layout, to_decode_layout

# w32 must beat khalf by this factor to win (repack cost / measurement noise)
DEFAULT_MARGIN = 1.03

_LAYOUTS = ("khalf", "w32")


def _eligible(qt: QuantizedTensor) -> bool:
    """Mirror of to_decode_layout's gating: shapes with exactly one
    alternative layout available."""
    return qt.bits == 4 and not qt.is_codebook and qt.data.ndim == 2


def shape_key(qt: QuantizedTensor, m: int = 1) -> str:
    """Dispatch-table key for a quantized weight at inference batch M.

    Keys use the LOGICAL (khalf) shape so a table entry matches the same
    weight before and after repacking."""
    return (f"{qt.weight_dtype}:{qt.scheme}:g{qt.group_size}"
            f":K{qt.K}:N{qt.N}:M{m}")


def default_table_path() -> str:
    env = os.environ.get("ITX_DISPATCH_TABLE")
    if env:
        return env
    return os.path.join(
        os.path.expanduser("~"), ".cache", "itx_tpu", "woq_dispatch.json")


def load_table(path: Optional[str] = None) -> Dict[str, dict]:
    path = path or default_table_path()
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def save_table(table: Dict[str, dict], path: Optional[str] = None) -> str:
    path = path or default_table_path()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return path


def measure_layout(
    qt: QuantizedTensor,
    layout: str,
    m: int = 1,
    iters: int = 200,
    seed: int = 0,
) -> float:
    """Per-call seconds for woq_matmul on `qt` repacked into `layout`.

    Differential timing (two iteration counts, take the slope) so the ~30 ms
    relay dispatch latency cancels; the fed-back output reduction keeps XLA
    from hoisting the loop body (same recipe as benchmarks/bench_woq_shapes).
    """
    from .quant_matmul import woq_matmul

    if layout == "w32":
        qt = jax.jit(to_decode_layout)(qt)
    elif qt.layout != "khalf":
        qt = jax.jit(from_decode_layout)(qt)
    x0 = jax.random.normal(jax.random.PRNGKey(seed), (m, qt.K), jnp.bfloat16)

    def loop(x0, qt, n):
        def body(_, x):
            out = woq_matmul(x, qt, out_dtype=jnp.bfloat16)
            bump = jnp.sum(out, axis=-1, keepdims=True) * jnp.bfloat16(1e-30)
            return x + bump
        return jax.lax.fori_loop(0, n, body, x0)

    jloop = jax.jit(loop, static_argnums=(2,))
    lo, hi = iters, iters * 6
    float(jloop(x0, qt, lo)[0, 0])  # compile + warm
    float(jloop(x0, qt, hi)[0, 0])
    t0 = time.perf_counter()
    float(jloop(x0, qt, lo)[0, 0])
    t1 = time.perf_counter()
    float(jloop(x0, qt, hi)[0, 0])
    t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / (hi - lo), 1e-9)


def tune_leaf(
    qt: QuantizedTensor,
    m: int = 1,
    iters: int = 200,
    margin: float = DEFAULT_MARGIN,
    measure_fn: Optional[Callable[[QuantizedTensor, str, int], float]] = None,
) -> dict:
    """Benchmark both layouts for one weight; return its table entry."""
    mf = measure_fn or (lambda q, lay, mm: measure_layout(q, lay, mm, iters))
    t_khalf = mf(qt, "khalf", m)
    t_w32 = mf(qt, "w32", m)
    winner = "w32" if t_khalf > t_w32 * margin else "khalf"
    return {
        "layout": winner,
        "khalf_us": round(t_khalf * 1e6, 2),
        "w32_us": round(t_w32 * 1e6, 2),
    }


def _qt_leaves(tree) -> Iterable[QuantizedTensor]:
    return (
        leaf for leaf in jax.tree_util.tree_leaves(
            tree, is_leaf=lambda x: isinstance(x, QuantizedTensor))
        if isinstance(leaf, QuantizedTensor)
    )


def apply_table(tree, table: Dict[str, dict], m: int = 1):
    """Repack each eligible QuantizedTensor leaf into its table-winning
    layout (leaves without an entry keep the khalf default)."""

    def go(x):
        if not isinstance(x, QuantizedTensor) or not _eligible(x):
            return x
        entry = table.get(shape_key(x, m))
        want = entry["layout"] if entry else "khalf"
        if want == "w32":
            return to_decode_layout(x)
        return from_decode_layout(x)

    return jax.tree_util.tree_map(
        go, tree, is_leaf=lambda x: isinstance(x, QuantizedTensor))


def tune_tree(
    tree,
    m: int = 1,
    iters: int = 200,
    margin: float = DEFAULT_MARGIN,
    table_path: Optional[str] = None,
    persist: bool = True,
    measure_fn: Optional[Callable] = None,
    verbose: bool = False,
) -> Tuple[object, Dict[str, dict]]:
    """Tune every distinct eligible weight shape in a param tree, persist the
    dispatch table, and return (repacked_tree, table).

    Shapes already present in the table are NOT re-measured (the reference's
    INFERENCE-mode replay); delete the table file to force a re-tune.
    """
    table = load_table(table_path)
    seen = set()
    for leaf in _qt_leaves(tree):
        if not _eligible(leaf):
            continue
        key = shape_key(leaf, m)
        if key in table or key in seen:
            continue
        seen.add(key)
        entry = tune_leaf(leaf, m=m, iters=iters, margin=margin,
                          measure_fn=measure_fn)
        table[key] = entry
        if verbose:
            print(f"[op_tuning] {key}: khalf {entry['khalf_us']:.1f}us "
                  f"w32 {entry['w32_us']:.1f}us -> {entry['layout']}",
                  flush=True)
    if persist and seen:
        save_table(table, table_path)
    return apply_table(tree, table, m), table
