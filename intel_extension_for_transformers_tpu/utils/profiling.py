"""Profiling & observability.

Re-creation of the reference's tracing surfaces
(reference: executor profiling CSV + chrome-trace,
executor/include/profiling.hpp:214-247; SparseLib SPARSE_LIB_VERBOSE
per-kernel ms, kernels/src/verbose.cpp) on TPU primitives:

- `trace(dir)` → jax.profiler trace (TensorBoard/Perfetto-compatible), the
  chrome-trace analogue.
- `annotate(name)` → named region inside a trace (TraceAnnotation).
- `StageTimer` → host-side per-stage wall times with JSON/CSV export, the
  per-op CSV analogue for pipeline stages (encode/index/search/generate).
- `ITX_VERBOSE=1` env → StageTimer prints per-stage ms as they close, the
  SPARSE_LIB_VERBOSE analogue.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

VERBOSE = os.environ.get("ITX_VERBOSE", "0") not in ("0", "", "false")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Device-level profiler trace; view in TensorBoard or Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region (shows up inside device traces)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class StageRecord:
    name: str
    start: float
    duration_ms: float
    meta: dict = field(default_factory=dict)


class StageTimer:
    """Accumulates named stage timings; exports JSONL/CSV like the
    reference's engine_profiling directory."""

    def __init__(self, verbose: Optional[bool] = None):
        self.records: List[StageRecord] = []
        self.verbose = VERBOSE if verbose is None else verbose
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str, **meta) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1e3
            self.records.append(StageRecord(name, t0 - self._t0, dt, meta))
            if self.verbose:
                print(f"[itx-profile] {name}: {dt:.2f} ms {meta or ''}")

    def totals(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for r in self.records:
            out[r.name] = out.get(r.name, 0.0) + r.duration_ms
        return out

    def write_jsonl(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            for r in self.records:
                f.write(
                    json.dumps(
                        {
                            "name": r.name,
                            "start_s": r.start,
                            "duration_ms": r.duration_ms,
                            **r.meta,
                        }
                    )
                    + "\n"
                )

    def write_csv(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            f.write("name,start_s,duration_ms\n")
            for r in self.records:
                f.write(f"{r.name},{r.start:.6f},{r.duration_ms:.3f}\n")
