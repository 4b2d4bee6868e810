"""Host→device input pipeline: background batch preparation + prefetch.

The SURVEY §7 hard-parts list calls for "an input pipeline that keeps the
TPU fed (grain/tf.data host-side)". TPU-native shape of that idea without
new dependencies: a daemon thread drains the (possibly slow) host iterator
— tokenization, numpy stacking, disk — into a bounded queue, and batches
are `jax.device_put` EARLY so the H2D transfer of batch N+1 overlaps step
N's compute (transfers are async; the train step only blocks if the copy
hasn't landed). `sharding` places batches directly into their mesh layout
(e.g. `NamedSharding(mesh, P("dp", None))`), so multi-chip feeds skip the
host-replica bounce.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


_END = object()


def prefetch_to_device(
    batches: Iterable,
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator:
    """Wrap a host batch iterator with background device prefetch.

    batches: iterable of pytrees of numpy/jax arrays (dicts of (B, ...) ok).
    size: queue depth (2 = classic double buffering).
    sharding: optional target placement for every leaf.
    """

    def put(x):
        if sharding is not None:
            return jax.device_put(x, sharding)
        return jax.device_put(x)

    q: "queue.Queue" = queue.Queue(maxsize=max(1, size))
    err: list = []
    stop = threading.Event()

    def put_or_stop(item) -> bool:
        # bounded-wait put so an abandoned consumer (early break / GC of
        # the generator) releases the worker instead of leaking a thread
        # blocked in q.put holding device buffers for the process lifetime
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for b in batches:
                if not put_or_stop(jax.tree.map(put, b)):
                    return
        except Exception as e:  # noqa: BLE001 — surface on the consumer side
            err.append(e)
        finally:
            put_or_stop(_END)

    threading.Thread(target=worker, daemon=True).start()

    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
