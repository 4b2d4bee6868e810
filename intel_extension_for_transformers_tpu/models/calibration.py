"""Calibration: capture per-linear input activations.

The analogue of the reference's calibration hooks (reference:
llm/quantization/utils.py:437 `default_run_fn` feeding INC's AWQ/GPTQ/
SmoothQuant calibration) — functionally: wrap each targeted kernel leaf in a
`TapKernel`; `ops.layers.dense` records the incoming activations and
delegates to the base weight. The wrapped tree is run EAGERLY (no jit) for a
few batches, so recording is plain Python — calibration cost is negligible
next to quantization itself.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List, Optional

import numpy as np

import jax

from intel_extension_for_transformers_tpu.quantization.quantize import (
    _path_str,
    default_is_quantizable,
)


class TapKernel:
    """Transparent activation recorder around a kernel leaf."""

    def __init__(self, base, path: str, store: Dict[str, list], max_rows: int):
        self.base = base
        self.path = path
        self.store = store
        self.max_rows = max_rows

    def record(self, x) -> None:
        rows = np.asarray(x, np.float32).reshape(-1, np.asarray(x).shape[-1])
        have = sum(r.shape[0] for r in self.store.setdefault(self.path, []))
        if have < self.max_rows:
            self.store[self.path].append(rows[: self.max_rows - have])


def wrap_with_taps(
    params: Any,
    store: Dict[str, list],
    is_quantizable: Optional[Callable] = None,
    max_rows: int = 512,
) -> Any:
    is_quantizable = is_quantizable or default_is_quantizable

    def wrap(path, leaf):
        p = _path_str(path)
        if is_quantizable(p, leaf):
            return TapKernel(leaf, p, store, max_rows)
        return leaf

    return jax.tree_util.tree_map_with_path(wrap, params)


def collect_linear_inputs(
    params: Any,
    run_fn: Callable[[Any, Any], Any],
    batches: Iterable[Any],
    is_quantizable: Optional[Callable] = None,
    max_rows: int = 512,
) -> Dict[str, np.ndarray]:
    """→ {param_path: (S, K) float32} calibration activations.

    run_fn(wrapped_params, batch) must execute the model WITHOUT jit (the
    taps are Python objects). E.g.
    `lambda p, b: llama_apply(p, config, b["input_ids"])`.
    """
    store: Dict[str, list] = {}
    wrapped = wrap_with_taps(params, store, is_quantizable, max_rows)
    for batch in batches:
        run_fn(wrapped, batch)
    return {k: np.concatenate(v, axis=0) for k, v in store.items() if v}
