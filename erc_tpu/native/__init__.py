"""ctypes bindings for the native batching runtime.

``get_lib()`` lazily builds+loads libcollate.so; every entry point has a
pure-numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        from erc_tpu.native.build import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.pack_rows.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.pack_labels.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.fill_mask.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr_array(arrays: List[Optional[np.ndarray]]):
    ptrs = (ctypes.c_void_p * len(arrays))()
    for i, a in enumerate(arrays):
        ptrs[i] = 0 if a is None else a.ctypes.data_as(ctypes.c_void_p).value
    return ptrs


def pack_rows(
    rows: List[Optional[np.ndarray]], lens: np.ndarray, L: int, D: int,
    out: Optional[np.ndarray] = None, n_threads: int = 4,
) -> np.ndarray:
    """Pack [len_i, D] float32 rows into [B, L, D] (zero padded)."""
    B = len(rows)
    rows = [
        None if r is None else np.ascontiguousarray(r, dtype=np.float32) for r in rows
    ]
    if out is None:
        out = np.empty((B, L, D), np.float32)
    lens32 = np.ascontiguousarray(lens, np.int32)
    lib = get_lib()
    if lib is not None:
        lib.pack_rows(
            _ptr_array(rows), lens32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            B, L, D, out.ctypes.data_as(ctypes.c_void_p), n_threads,
        )
        return out
    out[:] = 0
    for i, r in enumerate(rows):
        if r is not None:
            n = min(int(lens32[i]), L)
            out[i, :n] = r[:n]
    return out


def pack_labels(
    rows: List[Optional[np.ndarray]], lens: np.ndarray, L: int, fill: int = -1
) -> np.ndarray:
    B = len(rows)
    rows = [
        None if r is None else np.ascontiguousarray(r, dtype=np.int32) for r in rows
    ]
    out = np.empty((B, L), np.int32)
    lens32 = np.ascontiguousarray(lens, np.int32)
    lib = get_lib()
    if lib is not None:
        lib.pack_labels(
            _ptr_array(rows), lens32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            B, L, fill, out.ctypes.data_as(ctypes.c_void_p),
        )
        return out
    out[:] = fill
    for i, r in enumerate(rows):
        if r is not None:
            n = min(int(lens32[i]), L)
            out[i, :n] = r[:n]
    return out


def fill_mask(lens: np.ndarray, L: int) -> np.ndarray:
    B = len(lens)
    out = np.empty((B, L), np.float32)
    lens32 = np.ascontiguousarray(lens, np.int32)
    lib = get_lib()
    if lib is not None:
        lib.fill_mask(
            lens32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), B, L,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out
    out[:] = (np.arange(L)[None, :] < lens32[:, None]).astype(np.float32)
    return out
