# -*- coding: utf-8 -*-
"""Native (C++) host-runtime components with pure-numpy fallbacks.

The TPU compute path is JAX/XLA/Pallas; the host-side runtime around it —
the feature-store gather-join that feeds the input pipeline (the reference's
input bottleneck, drin/data.py:85-126) — is implemented natively in C++
(``src/gather.cpp``) and loaded via ctypes.  Every entry point degrades to a
numpy implementation when the shared library has not been built, so the
framework works out of the box.

Build: ``make -C drin_tpu/native`` (or ``python -m drin_tpu.native.build``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libdrin_native.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.drin_gather_rows.argtypes = [
                ctypes.c_void_p,  # src
                ctypes.c_void_p,  # dst
                ctypes.POINTER(ctypes.c_int32),  # row indices
                ctypes.c_int64,  # n rows to gather
                ctypes.c_int64,  # row nbytes
                ctypes.c_int32,  # n threads
            ]
            lib.drin_gather_rows.restype = ctypes.c_int32
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def native_available() -> bool:
    return _load_lib() is not None


def gather_rows(table: np.ndarray, rows: np.ndarray) -> np.ndarray:
    """Gather ``table[rows]`` where ``rows`` may be multi-dimensional.

    Output shape: ``rows.shape + table.shape[1:]``.  Uses the threaded C++
    gather for large contiguous tables; numpy fancy-indexing otherwise."""
    rows = np.asarray(rows)
    lib = _load_lib()
    flat = rows.reshape(-1).astype(np.int32, copy=False)
    row_nbytes = int(np.prod(table.shape[1:])) * table.dtype.itemsize
    # The native path needs a real contiguous buffer (mmap-backed arrays are
    # fine: the pointer is valid; the OS pages data in on access).
    use_native = (
        lib is not None
        and isinstance(table, np.ndarray)
        and table.flags["C_CONTIGUOUS"]
        and row_nbytes >= 256  # tiny rows: numpy is already fine
        and flat.size >= 64
    )
    if not use_native:
        return np.ascontiguousarray(table[rows])
    out = np.empty((flat.size,) + table.shape[1:], dtype=table.dtype)
    idx = np.ascontiguousarray(flat)
    nthreads = min(8, os.cpu_count() or 1)
    rc = lib.drin_gather_rows(
        table.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(flat.size),
        ctypes.c_int64(row_nbytes),
        ctypes.c_int32(nthreads),
    )
    if rc != 0:  # defensive; the C++ side only fails on bad args
        return np.ascontiguousarray(table[rows])
    return out.reshape(rows.shape + table.shape[1:])
