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


# ========================== native BPE tokenizer ==========================

_BPE_SRC = os.path.join(_DIR, "bpe_tokenizer.cpp")
_BPE_LIB = os.path.join(_DIR, "libbpe_tokenizer.so")
_bpe_lib: Optional[ctypes.CDLL] = None
_bpe_tried = False


def _load_bpe() -> Optional[ctypes.CDLL]:
    """Build (g++, lazy) + load the BPE library; None if unavailable."""
    global _bpe_lib, _bpe_tried
    with _lock:
        if _bpe_lib is not None or _bpe_tried:
            return _bpe_lib
        _bpe_tried = True
        needs_build = not os.path.exists(_BPE_LIB) or (
            os.path.exists(_BPE_SRC)
            and os.path.getmtime(_BPE_SRC) > os.path.getmtime(_BPE_LIB)
        )
        if needs_build:
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   _BPE_SRC, "-o", _BPE_LIB]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            except (subprocess.SubprocessError, FileNotFoundError) as e:
                logger.info("native BPE build failed (%s)", e)
                return None
        try:
            lib = ctypes.CDLL(_BPE_LIB)
        except OSError as e:
            logger.info("native BPE load failed: %s", e)
            return None
        lib.bpe_new.restype = ctypes.c_void_p
        lib.bpe_free.argtypes = [ctypes.c_void_p]
        lib.bpe_add_token.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int32,
        ]
        lib.bpe_add_merge.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int32,
        ]
        lib.bpe_encode.restype = ctypes.c_int
        lib.bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.bpe_decode.restype = ctypes.c_void_p
        lib.bpe_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.bpe_buf_free.argtypes = [ctypes.c_void_p]
        _bpe_lib = lib
        return _bpe_lib


def bpe_available() -> bool:
    return _load_bpe() is not None


def _gpt2_byte_decoder() -> dict:
    """Inverse of GPT-2's bytes→unicode alphabet (tokenizer.json tokens are
    stored in the mapped space; the C++ side works on raw bytes)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


class BPETokenizerNative:
    """GPT-2-family byte-level BPE running in C++ (see bpe_tokenizer.cpp).

    The native pre-tokenizer implements the ASCII subset of the GPT-2 split
    regex; `encodes_exactly(text)` tells callers whether the native result
    is byte-for-byte the HF `tokenizers` result (ASCII input) — route
    non-ASCII requests to the HF tokenizer.
    """

    def __init__(self, vocab: dict, merges, byte_level: bool = True):
        lib = _load_bpe()
        assert lib is not None, "native BPE unavailable"
        self._lib = lib
        self._h = lib.bpe_new()
        u2b = _gpt2_byte_decoder() if byte_level else None

        def raw(tok: str) -> bytes:
            if u2b is None:
                return tok.encode("utf-8")
            return bytes(u2b[ch] for ch in tok)

        for tok, idx in vocab.items():
            b = raw(tok)
            lib.bpe_add_token(self._h, b, len(b), int(idx))
        for rank, m in enumerate(merges):
            if isinstance(m, str):
                left, right = m.split(" ", 1)
            else:
                left, right = m
            lb, rb = raw(left), raw(right)
            lib.bpe_add_merge(self._h, lb, len(lb), rb, len(rb), rank)

    @classmethod
    def from_tokenizer_json(cls, path_or_dict) -> "BPETokenizerNative":
        """Load an HF tokenizer.json (BPE model with ByteLevel pre-tok)."""
        import json as _json

        if isinstance(path_or_dict, (str, os.PathLike)):
            with open(path_or_dict) as f:
                spec = _json.load(f)
        else:
            spec = path_or_dict
        model = spec["model"]
        if model.get("type") != "BPE":
            raise ValueError(f"not a BPE tokenizer: {model.get('type')}")
        return cls(model["vocab"], model["merges"])

    @staticmethod
    def encodes_exactly(text: str) -> bool:
        return text.isascii()

    def encode(self, text: str) -> List[int]:
        data = text.encode("utf-8")
        out = np.zeros(max(len(data), 1), np.int32)
        n = self._lib.bpe_encode(
            self._h, data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(out),
        )
        return out[:n].tolist()

    def decode(self, ids) -> str:
        arr = np.asarray(list(ids), np.int32)
        out_len = ctypes.c_int(0)
        ptr = self._lib.bpe_decode(
            self._h,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(arr),
            ctypes.byref(out_len),
        )
        try:
            raw = ctypes.string_at(ptr, out_len.value)
        finally:
            self._lib.bpe_buf_free(ptr)
        return raw.decode("utf-8", errors="replace")

    def __del__(self):
        try:
            self._lib.bpe_free(self._h)
        except Exception:
            pass
