"""Native host-runtime helpers (C, loaded via ctypes).

Parity: the reference's host runtime leans on native code in two places —
the xxhash C library for prefix-cache block hashing
(`lightvllm/engine/block_manager.py:5,64-81`) and compiled torch ops for
input prep. Here the equivalents are a self-contained C file compiled once
with the system compiler and bound with ctypes (pybind11 is not available in
this image). Everything has a pure-Python/numpy fallback so the package
works without a toolchain.

Build artifacts are cached next to the source, keyed by source mtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "lv_native.c")
_LIB_PATH = os.path.join(_DIR, f"_lv_native_{sys.implementation.cache_tag}.so")

_lib = None


def _build() -> str | None:
    if not os.path.exists(_SRC):
        return None
    if (
        os.path.exists(_LIB_PATH)
        and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
    ):
        return _LIB_PATH
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return _LIB_PATH
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.lv_xxh64.restype = ctypes.c_uint64
    lib.lv_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint64]
    lib.lv_block_hash.restype = ctypes.c_uint64
    lib.lv_block_hash.argtypes = [
        ctypes.c_void_p,
        ctypes.c_size_t,
        ctypes.c_uint64,
        ctypes.c_int,
    ]
    lib.lv_fill_slots.restype = None
    lib.lv_fill_slots.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def xxh64(data: bytes, seed: int = 0) -> int:
    lib = _load()
    assert lib is not None
    return int(lib.lv_xxh64(data, len(data), seed & 0xFFFFFFFFFFFFFFFF))


def block_hash(token_ids, prefix: int = -1) -> int:
    """Chained prefix-cache block hash (native xxhash64 over i64le tokens).

    Falls back to hashlib in the caller (engine/block_manager.py) when the
    native library is unavailable.
    """
    lib = _load()
    assert lib is not None
    arr = np.ascontiguousarray(token_ids, dtype=np.int64)
    return int(
        lib.lv_block_hash(
            arr.ctypes.data,
            arr.size,
            (prefix & 0xFFFFFFFFFFFFFFFF) if prefix != -1 else 0,
            1 if prefix != -1 else 0,
        )
    )


def fill_slots(
    block_table: np.ndarray, block_size: int, start_pos: int, n: int
) -> np.ndarray:
    """out[j] = bt[(start+j)//bs]*bs + (start+j)%bs, computed natively."""
    lib = _load()
    assert lib is not None
    bt = np.ascontiguousarray(block_table, dtype=np.int32)
    out = np.empty(n, np.int32)
    lib.lv_fill_slots(bt.ctypes.data, block_size, start_pos, n, out.ctypes.data)
    return out
