"""ctypes bindings for the C++ host-runtime library (native/gdr_native.cpp).

Auto-builds on first use when a compiler is available; every entry point has
a pure-Python fallback, so the framework is fully functional either way —
the native paths are strictly faster, never different (identical outputs are
asserted in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgdr_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception as e:
        print(f"gdr_native build failed: {e}", file=sys.stderr)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.gdr_build_trie.restype = ctypes.c_int
    lib.gdr_build_trie.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, i32p, u8p, i32p, i32p, i32p, i32p, i64p]
    lib.gdr_hash_tokenize_batch.restype = None
    lib.gdr_hash_tokenize_batch.argtypes = [
        ctypes.c_char_p, i64p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, i32p]
    lib.gdr_scan_lines.restype = ctypes.c_int64
    lib.gdr_scan_lines.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                   ctypes.c_int64, i64p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def build_trie_arrays(paths: Sequence[Sequence[int]], kary: int
                      ) -> Optional[dict]:
    """Pack digit paths into trie arrays via C++.  Returns None when the
    native library is unavailable (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    max_depth = max((len(p) for p in paths), default=1) or 1
    pbuf = np.full((n, max_depth), -1, np.int32)
    lens = np.zeros(n, np.int32)
    for i, p in enumerate(paths):
        pbuf[i, : len(p)] = p
        lens[i] = len(p)
    max_nodes = n * max_depth + 1
    children = np.full((max_nodes, kary), -1, np.int32)
    eos = np.zeros(max_nodes, np.uint8)
    depth = np.zeros(max_nodes, np.int32)
    doc_start = np.zeros(max_nodes, np.int32)
    doc_count = np.zeros(max_nodes, np.int32)
    doc_indices = np.zeros(max(n, 1), np.int32)
    num_nodes = np.zeros(1, np.int64)
    rc = lib.gdr_build_trie(
        _ptr(pbuf, ctypes.c_int32), _ptr(lens, ctypes.c_int32),
        n, max_depth, kary, max_nodes,
        _ptr(children, ctypes.c_int32), _ptr(eos, ctypes.c_uint8),
        _ptr(depth, ctypes.c_int32), _ptr(doc_start, ctypes.c_int32),
        _ptr(doc_count, ctypes.c_int32), _ptr(doc_indices, ctypes.c_int32),
        _ptr(num_nodes, ctypes.c_int64))
    if rc != 0:
        raise RuntimeError(f"gdr_build_trie failed rc={rc}")
    m = int(num_nodes[0])
    return {
        "children": children[:m].copy(),
        "eos_allowed": eos[:m].astype(bool),
        "depth": depth[:m].copy(),
        "doc_start": doc_start[:m].copy(),
        "doc_count": doc_count[:m].copy(),
        "doc_indices": doc_indices[:n].copy(),
    }


def hash_encode_batch(texts: Sequence[str], max_length: int, vocab_size: int,
                      lower: bool) -> tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    blobs = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(len(blobs) + 1, np.int64)
    for i, b in enumerate(blobs):
        offsets[i + 1] = offsets[i] + len(b)
    buf = b"".join(blobs)
    ids = np.zeros((len(blobs), max_length), np.int32)
    lib.gdr_hash_tokenize_batch(
        buf, _ptr(offsets, ctypes.c_int64), len(blobs), max_length,
        vocab_size, int(lower), _ptr(ids, ctypes.c_int32))
    mask = (ids != 0).astype(np.int32)
    return ids, mask


def scan_lines(data: bytes, max_rows: int = 1 << 30) -> np.ndarray:
    """Byte offsets of each line start (+ terminal offset)."""
    lib = _load()
    assert lib is not None
    max_rows = min(max_rows, data.count(b"\n") + 1)
    offs = np.zeros(max_rows + 1, np.int64)
    n = lib.gdr_scan_lines(data, len(data), max_rows,
                           _ptr(offs, ctypes.c_int64))
    return offs[: n + 1]
