"""Host→device prefetch pipeline: ordering, errors, and worker lifetime.

The trainer breaks out of its batch loop at max_steps (trainer.py train
loop), abandoning the prefetch generator — the worker must terminate
rather than stay blocked in q.put holding device buffers (the leaked
thread shows up in crash dumps of long pytest runs).
"""

import threading
import time

import numpy as np
import pytest

from intel_extension_for_transformers_tpu.utils.prefetch import (
    prefetch_to_device,
)


def _batches(n, stop_evt=None):
    for i in range(n):
        if stop_evt is not None:
            stop_evt.set()
        yield {"x": np.full((2, 3), i, np.float32)}


def test_order_and_values():
    out = list(prefetch_to_device(_batches(5)))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2, 3), i))


def test_producer_error_surfaces_on_consumer():
    def bad():
        yield {"x": np.zeros((2,), np.float32)}
        raise RuntimeError("producer boom")

    it = prefetch_to_device(bad())
    next(it)
    with pytest.raises(RuntimeError, match="producer boom"):
        list(it)


def test_abandoned_consumer_releases_worker():
    before = {t.ident for t in threading.enumerate()}
    it = prefetch_to_device(_batches(100), size=2)
    next(it)  # worker is now alive and the queue fills
    it.close()  # early break / GC of the generator
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = [
            t for t in threading.enumerate()
            if t.ident not in before and t.is_alive()
        ]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"prefetch worker leaked: {leaked}"
