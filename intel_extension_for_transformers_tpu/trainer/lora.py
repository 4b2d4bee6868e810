"""LoRA / QLoRA adapters as functional param-tree transforms.

Reference behavior re-created (peft-lora in llm/finetuning/finetuning.py:545
+ QLoRA on a 4-bit base via QuantizedLoraLinearQBits,
llm/quantization/nn/modules.py:395 — merge/unmerge, dequant backward).

TPU-first design: an adapter is a SEPARATE small pytree (`{..., {"a","b"}}`
mirroring the model tree at targeted linears). `attach_lora` zips it onto the
base params producing `LoraKernel` composite leaves that `ops.layers.dense`
understands; the train loop differentiates w.r.t. the adapter tree only, so
the multi-GB base stays frozen in HBM and grads/optimizer state are
rank-sized. QLoRA = the same attach over a quantized base (the Pallas WOQ
matmul's custom_vjp provides the dequantized backward, ops/quant_matmul.py).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.ops.layers import LoraKernel
from intel_extension_for_transformers_tpu.ops.packing import QuantizedTensor

# default targets: llama attention + mlp projections (reference
# find_all_linear_names, finetuning.py:357 targets all linears; peft default
# is q/v — we take attention projections which matches the chatbot recipes)
DEFAULT_TARGETS = ("q", "k", "v", "o")


@dataclass
class LoraConfig:
    r: int = 8
    lora_alpha: int = 16
    lora_dropout: float = 0.0  # accepted for parity; not applied at r this small
    target_modules: List[str] = field(default_factory=lambda: list(DEFAULT_TARGETS))

    @property
    def scaling(self) -> float:
        return self.lora_alpha / self.r


def _kernel_shape(leaf) -> Optional[tuple]:
    if isinstance(leaf, QuantizedTensor):
        return (leaf.K, leaf.N)
    if hasattr(leaf, "ndim") and leaf.ndim == 2:
        return tuple(leaf.shape)
    return None


def lora_init(rng: jax.Array, params: Any, config: LoraConfig) -> Any:
    """→ adapter tree mirroring `params` at targeted linear dicts.

    A targeted linear is a dict with a 2D "kernel" whose key is in
    target_modules. a ~ N(0, 1/r) (kaiming-ish), b = 0 → identity at init.
    """
    counter = [0]

    def walk(node, name: str):
        if isinstance(node, dict):
            if "kernel" in node and name in config.target_modules:
                shape = _kernel_shape(node["kernel"])
                if shape is None:
                    return None
                K, N = shape
                counter[0] += 1
                sub = jax.random.fold_in(rng, counter[0])
                return {
                    "a": (
                        jax.random.normal(sub, (K, config.r), jnp.float32)
                        / np.sqrt(K)
                    ),
                    "b": jnp.zeros((config.r, N), jnp.float32),
                }
            out = {}
            for k, v in node.items():
                got = walk(v, k)
                if got is not None:
                    out[k] = got
            return out or None
        if isinstance(node, (list, tuple)):
            items = [walk(v, name) for v in node]
            if all(i is None for i in items):
                return None
            return [i if i is not None else {} for i in items]
        return None

    tree = walk(params, "")
    if not tree:
        raise ValueError(
            f"no linears matched target_modules={config.target_modules}"
        )
    return tree


def attach_lora(params: Any, lora: Any, scaling: float) -> Any:
    """Zip adapter onto base params → tree with LoraKernel leaves.

    Cheap (pure tree restructuring, no copies of base weights); run inside
    the jitted step so adapter grads flow while the base is a captured
    constant."""

    def walk(p, l):
        if isinstance(l, dict) and set(l) == {"a", "b"}:
            new = dict(p)
            new["kernel"] = LoraKernel(p["kernel"], l["a"], l["b"], scaling)
            return new
        if isinstance(l, dict):
            new = dict(p)
            for k, v in l.items():
                new[k] = walk(p[k], v)
            return new
        if isinstance(l, (list, tuple)):
            return [walk(pi, li) if li else pi for pi, li in zip(p, l)]
        return p

    return walk(params, lora)


def merge_lora(params: Any, lora: Any, scaling: float) -> Any:
    """Fold s·(A@B) into float base kernels (reference: LoRA merge,
    modules.py:430). Quantized bases cannot be merged without requantizing —
    they raise; keep the adapter attached at inference instead."""

    def walk(p, l):
        if isinstance(l, dict) and set(l) == {"a", "b"}:
            new = dict(p)
            k = p["kernel"]
            if isinstance(k, QuantizedTensor):
                raise ValueError(
                    "cannot merge into a quantized base; keep adapter attached "
                    "or dequantize-merge-requantize explicitly"
                )
            delta = (scaling * (l["a"] @ l["b"])).astype(k.dtype)
            new["kernel"] = k + delta
            return new
        if isinstance(l, dict):
            new = dict(p)
            for key, v in l.items():
                new[key] = walk(p[key], v)
            return new
        if isinstance(l, (list, tuple)):
            return [walk(pi, li) if li else pi for pi, li in zip(p, l)]
        return p

    return walk(params, lora)


# ------------------------------------------------------------- persistence

ADAPTER_WEIGHTS = "adapter_weights.npz"
ADAPTER_CONFIG = "adapter_config.json"


def save_adapter(lora: Any, config: LoraConfig, save_dir: str) -> None:
    os.makedirs(save_dir, exist_ok=True)
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict) and set(node) == {"a", "b"}:
            flat[prefix + "::a"] = np.asarray(node["a"])
            flat[prefix + "::b"] = np.asarray(node["b"])
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                if v:
                    walk(v, f"{prefix}[{i}]")

    walk(lora, "")
    np.savez(os.path.join(save_dir, ADAPTER_WEIGHTS), **flat)
    with open(os.path.join(save_dir, ADAPTER_CONFIG), "w") as f:
        json.dump(
            {
                "r": config.r,
                "lora_alpha": config.lora_alpha,
                "lora_dropout": config.lora_dropout,
                "target_modules": list(config.target_modules),
            },
            f,
            indent=1,
        )


def load_adapter(save_dir: str) -> tuple[Any, LoraConfig]:
    with open(os.path.join(save_dir, ADAPTER_CONFIG)) as f:
        config = LoraConfig(**json.load(f))
    npz = np.load(os.path.join(save_dir, ADAPTER_WEIGHTS))

    tree: dict = {}
    for key in npz.files:
        path, part = key.split("::")
        node = tree
        tokens = []
        for seg in path.split("/"):
            while "[" in seg:
                head, rest = seg.split("[", 1)
                idx, seg = rest.split("]", 1)
                if head:
                    tokens.append(head)
                tokens.append(int(idx))
            if seg:
                tokens.append(seg)
        for t in tokens[:-1]:
            node = node.setdefault(t, {})
        node.setdefault(tokens[-1], {})[part] = jnp.asarray(npz[key])

    def listify(node):
        if isinstance(node, dict):
            if node and all(isinstance(k, int) for k in node):
                return [listify(node[i]) if i in node else {} for i in
                        range(max(node) + 1)]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(tree), config
