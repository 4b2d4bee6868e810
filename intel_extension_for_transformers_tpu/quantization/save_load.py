"""Packed-weight persistence: save_low_bit / load_low_bit.

Mirrors the reference round-trip (reference: modeling/modeling_auto.py:209
`save_low_bit`, :1312 `load_low_bit` — packed INT4 weights + quantization
config json). Format: one .npz of flattened arrays keyed by param path
(QuantizedTensor fields get `::data/::scales/::zeros/::pre_scale` suffixes)
plus `quantization_config.json` describing layout and config — fully
self-contained, no pickle.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.ops.packing import QuantizedTensor
from intel_extension_for_transformers_tpu.quantization.smoothquant import (
    W8A8Tensor,
)
from intel_extension_for_transformers_tpu.quantization.config import (
    config_from_dict,
)
from intel_extension_for_transformers_tpu.quantization.quantize import (
    QuantizedParams,
    _path_str,
)

WEIGHTS_NAME = "quantized_weights.npz"
CONFIG_NAME = "quantization_config.json"


def _is_qt(x):
    return isinstance(x, (QuantizedTensor, W8A8Tensor))


def save_low_bit(qparams: QuantizedParams, save_dir: str) -> None:
    os.makedirs(save_dir, exist_ok=True)
    arrays: dict[str, np.ndarray] = {}
    qt_meta: dict[str, dict] = {}

    def visit(path, leaf):
        p = _path_str(path)
        if isinstance(leaf, W8A8Tensor):
            arrays[p + "::data"] = np.asarray(leaf.data)
            arrays[p + "::w_scale"] = np.asarray(leaf.w_scale)
            if leaf.act_scale is not None:
                arrays[p + "::act_scale"] = np.asarray(leaf.act_scale)
            if leaf.pre_scale is not None:
                arrays[p + "::pre_scale"] = np.asarray(leaf.pre_scale)
            qt_meta[p] = {"kind": "w8a8", "K": leaf.K, "N": leaf.N}
            return leaf
        if _is_qt(leaf):
            arrays[p + "::data"] = np.asarray(leaf.data)
            arrays[p + "::scales"] = np.asarray(leaf.scales)
            if leaf.zeros is not None:
                arrays[p + "::zeros"] = np.asarray(leaf.zeros)
            if leaf.pre_scale is not None:
                arrays[p + "::pre_scale"] = np.asarray(leaf.pre_scale)
            qt_meta[p] = {
                "weight_dtype": leaf.weight_dtype,
                "scheme": leaf.scheme,
                "group_size": leaf.group_size,
                "K": leaf.K,
                "N": leaf.N,
            }
        else:
            arrays[p] = np.asarray(leaf)
        return leaf

    jax.tree_util.tree_map_with_path(visit, qparams.params, is_leaf=_is_qt)

    np.savez(os.path.join(save_dir, WEIGHTS_NAME), **arrays)
    cfg = {
        "format_version": 1,
        "config": qparams.config.to_dict() if qparams.config is not None else None,
        "quantized_paths": sorted(qt_meta),
        "qt_meta": qt_meta,
        "treedef": _tree_template(qparams.params),
    }
    with open(os.path.join(save_dir, CONFIG_NAME), "w") as f:
        json.dump(cfg, f, indent=2)


def _tree_template(tree) -> Any:
    """Nested-dict skeleton with leaf markers (dict/list trees only)."""
    if _is_qt(tree) or hasattr(tree, "shape"):
        return "__leaf__"
    if isinstance(tree, dict):
        return {k: _tree_template(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_tree_template(v) for v in tree]
    return "__leaf__"


def load_low_bit(save_dir: str) -> QuantizedParams:
    with open(os.path.join(save_dir, CONFIG_NAME)) as f:
        cfg = json.load(f)
    npz = np.load(os.path.join(save_dir, WEIGHTS_NAME))
    qt_meta = cfg["qt_meta"]

    # group npz keys by path
    plain: dict[str, np.ndarray] = {}
    qt_parts: dict[str, dict] = {}
    for key in npz.files:
        if "::" in key:
            path, part = key.split("::", 1)
            qt_parts.setdefault(path, {})[part] = npz[key]
        else:
            plain[key] = npz[key]

    leaves: dict[str, Any] = dict(plain)
    for path, parts in qt_parts.items():
        m = qt_meta[path]
        if m.get("kind") == "w8a8":
            leaves[path] = W8A8Tensor(
                data=jnp.asarray(parts["data"]),
                w_scale=jnp.asarray(parts["w_scale"]),
                act_scale=(
                    jnp.asarray(parts["act_scale"]) if "act_scale" in parts else None
                ),
                pre_scale=(
                    jnp.asarray(parts["pre_scale"]) if "pre_scale" in parts else None
                ),
                K=m["K"],
                N=m["N"],
            )
            continue
        leaves[path] = QuantizedTensor(
            data=jnp.asarray(parts["data"]),
            scales=jnp.asarray(parts["scales"]),
            zeros=jnp.asarray(parts["zeros"]) if "zeros" in parts else None,
            pre_scale=jnp.asarray(parts["pre_scale"]) if "pre_scale" in parts else None,
            weight_dtype=m["weight_dtype"],
            scheme=m["scheme"],
            group_size=m["group_size"],
            K=m["K"],
            N=m["N"],
        )

    params = _fill_template(cfg["treedef"], "", leaves)
    config = config_from_dict(cfg["config"]) if cfg.get("config") else None
    return QuantizedParams(params, config, list(cfg.get("quantized_paths", [])))


def _fill_template(tmpl, prefix: str, leaves: dict):
    if tmpl == "__leaf__":
        v = leaves[prefix]
        return jnp.asarray(v) if isinstance(v, np.ndarray) else v
    if isinstance(tmpl, dict):
        return {
            k: _fill_template(v, f"{prefix}/{k}" if prefix else k, leaves)
            for k, v in tmpl.items()
        }
    if isinstance(tmpl, list):
        return [
            _fill_template(v, f"{prefix}/{i}" if prefix else str(i), leaves)
            for i, v in enumerate(tmpl)
        ]
    raise ValueError(f"bad template node {tmpl!r}")
