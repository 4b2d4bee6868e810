"""ctypes bindings for the native text engine (auto-built with g++).

The native runtime layer of the framework (see text_engine.cpp for the
design rationale and C ABI). Python semantics of everything here have
pure-Python fallbacks in retrieval/splitter.py and retrieval/bm25.py — the
native path is an accelerator, never a requirement; `available()` gates it.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "text_engine.cpp")
_LIB = os.path.join(_DIR, "libtext_engine.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.info("native text engine build failed (%s); using Python paths", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        needs_build = not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        )
        if needs_build and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            logger.info("native text engine load failed: %s", e)
            return None
        lib.te_split_text.restype = ctypes.c_void_p
        lib.te_split_text.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.te_free.argtypes = [ctypes.c_void_p]
        lib.te_bm25_new.restype = ctypes.c_void_p
        lib.te_bm25_new.argtypes = [ctypes.c_double, ctypes.c_double]
        lib.te_bm25_add.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.te_bm25_size.restype = ctypes.c_int
        lib.te_bm25_size.argtypes = [ctypes.c_void_p]
        lib.te_bm25_query.restype = ctypes.c_int
        lib.te_bm25_query.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.te_bm25_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def split_text(text: str, chunk_size: int, chunk_overlap: int) -> List[str]:
    """Native recursive character split. ASCII-exact vs the Python splitter;
    multi-byte text must use the Python path (byte-level slicing could cut
    code points) — callers gate on text.isascii()."""
    lib = _load()
    assert lib is not None, "native engine unavailable"
    ptr = lib.te_split_text(text.encode(), chunk_size, chunk_overlap)
    try:
        raw = ctypes.string_at(ptr)
    finally:
        lib.te_free(ptr)
    if not raw:
        return []
    return raw.decode("utf-8", errors="replace").split("\x1e")


class BM25Native:
    """Inverted-index BM25 (same scores as retrieval/bm25.py)."""

    def __init__(self, k1: float = 1.5, b: float = 0.75):
        lib = _load()
        assert lib is not None, "native engine unavailable"
        self._lib = lib
        self._h = lib.te_bm25_new(k1, b)

    def add(self, text: str) -> int:
        self._lib.te_bm25_add(self._h, text.encode())
        return self._lib.te_bm25_size(self._h) - 1

    def __len__(self) -> int:
        return self._lib.te_bm25_size(self._h)

    def query(self, text: str, k: int) -> Tuple[np.ndarray, np.ndarray]:
        k = min(k, len(self)) if len(self) else 0
        ids = np.zeros(max(k, 1), np.int32)
        scores = np.zeros(max(k, 1), np.float32)
        n = self._lib.te_bm25_query(
            self._h,
            text.encode(),
            k,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return ids[:n], scores[:n]

    def __del__(self):
        try:
            self._lib.te_bm25_free(self._h)
        except Exception:
            pass
