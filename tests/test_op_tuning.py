"""WOQ layout auto-tuner: dispatch-table mechanics + repack parity.

Analogue of the reference's dispatcher-tuning pytest
(reference: runtime/test/pytest/test_dispatcher_tuning_throughput.py —
TUNING mode writes a dispatch table, INFERENCE replays it). Timing is
injected so the test is deterministic on CPU; numeric parity of the
repacked tree is checked against the dequant-einsum oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from intel_extension_for_transformers_tpu.ops import (
    quantize_groupwise,
    woq_matmul,
    woq_matmul_ref,
)
from intel_extension_for_transformers_tpu.ops.op_tuning import (
    apply_table,
    load_table,
    shape_key,
    tune_tree,
)


def _tree():
    rng = np.random.default_rng(0)
    mk = lambda K, N: jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    return {
        "up": quantize_groupwise(mk(512, 1024), group_size=128),
        "down": quantize_groupwise(mk(1024, 512), group_size=128),
        "int8": quantize_groupwise(mk(512, 256), weight_dtype="int8",
                                   group_size=128),
    }


def _fake_measure(qt, layout, m):
    # w32 "wins" only on the 512x1024 shape
    if (qt.K, qt.N) == (512, 1024):
        return 1e-6 if layout == "w32" else 2e-6
    return 2e-6 if layout == "w32" else 1e-6


def test_tune_tree_converts_only_winners(tmp_path):
    tree = _tree()
    path = str(tmp_path / "dispatch.json")
    tuned, table = tune_tree(tree, table_path=path,
                             measure_fn=_fake_measure)
    assert tuned["up"].layout == "w32"
    assert tuned["down"].layout == "khalf"
    assert tuned["int8"].layout == "khalf"  # ineligible: never tuned
    assert shape_key(tree["int8"]) not in table
    # table persisted and replayed without re-measuring
    on_disk = load_table(path)
    assert on_disk[shape_key(tree["up"])]["layout"] == "w32"
    calls = []
    retuned, _ = tune_tree(tree, table_path=path,
                           measure_fn=lambda *a: calls.append(a) or 1e-6)
    assert not calls, "table entries must be replayed, not re-measured"
    assert retuned["up"].layout == "w32"


def test_repacked_tree_parity(tmp_path):
    tree = _tree()
    tuned, _ = tune_tree(tree, table_path=str(tmp_path / "d.json"),
                         measure_fn=_fake_measure)
    rng = np.random.default_rng(1)
    for name in ("up", "down"):
        x = jnp.asarray(rng.normal(size=(1, tree[name].K)).astype(np.float32) * 0.1)
        ref = woq_matmul_ref(x, tree[name])
        out = woq_matmul(x.astype(jnp.bfloat16), tuned[name],
                         out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)


def test_apply_table_reverts_to_khalf():
    tree = _tree()
    w32 = apply_table(tree, {shape_key(tree["up"]): {"layout": "w32"}})
    assert w32["up"].layout == "w32"
    back = apply_table(w32, {})
    assert back["up"].layout == "khalf"
    assert back["up"].data.shape == tree["up"].data.shape
    np.testing.assert_array_equal(np.asarray(back["up"].data),
                                  np.asarray(tree["up"].data))
