"""ctypes bindings to the native host-side graph builder.

Loads ``native/libdfgnn_host.so`` (built by ``make -C native``; auto-built
on first import when a compiler is available).  Every entry point has a
pure-numpy fallback, so the package works without the native library — the
library makes reddit-scale preprocessing run at memcpy speed.

This is the TPU framework's counterpart of the reference's native
format/dispatch layer (``DFGNN/src/*/*.cpp``), applied to the host side:
on TPU the *device* side is Pallas/XLA, and the native code's job is the
graph-builder path (CSR construction, degree bucketing, dense collation,
neighbor sampling).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_ROOT, "native", "libdfgnn_host.so")


def _build() -> bool:
    src = os.path.join(_ROOT, "native", "graph_builder.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", _SO, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # pragma: no cover - toolchain-dependent
        print(f"[dfgnn-tpu] native build failed ({e}); using numpy fallback",
              file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:  # pragma: no cover
        print(f"[dfgnn-tpu] native load failed ({e}); using numpy fallback",
              file=sys.stderr)
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.csr_from_coo.argtypes = [ctypes.c_int64] * 2 + [i64p] * 5
    lib.bucket_fill.argtypes = [ctypes.c_int64, i64p, i64p, i64p, f32p,
                                ctypes.c_int64, i32p, u8p, f32p]
    lib.fill_dense_adj.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                   i64p, i64p, i64p, u8p]
    lib.sample_neighbors.argtypes = [ctypes.c_int64, i64p, i64p, i64p,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_uint64, i32p, u8p]
    _LIB = lib
    return lib


def _p(a, t):
    return a.ctypes.data_as(t)


_I64P = ctypes.POINTER(ctypes.c_int64)
_I32P = ctypes.POINTER(ctypes.c_int32)
_F32P = ctypes.POINTER(ctypes.c_float)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def csr_from_coo(rows: np.ndarray, cols: np.ndarray, n: int):
    """(indptr, cols_sorted, edge_perm) — counting sort by row (stable)."""
    e = len(rows)
    lib = get_lib()
    if lib is None:
        order = np.argsort(rows, kind="stable")
        indptr = np.zeros(n + 1, np.int64)
        np.add.at(indptr, rows + 1, 1)
        return np.cumsum(indptr), cols[order], order.astype(np.int64)
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    indptr = np.zeros(n + 1, np.int64)
    cols_out = np.empty(e, np.int64)
    perm = np.empty(e, np.int64)
    lib.csr_from_coo(n, e, _p(rows, _I64P), _p(cols, _I64P),
                     _p(indptr, _I64P), _p(cols_out, _I64P), _p(perm, _I64P))
    return indptr, cols_out, perm


def bucket_fill(sel, indptr, cols, val, width, nbr, emask, val_out) -> bool:
    """Fill padded neighbor block in-place.  Returns False if no native lib
    (caller should run the numpy path)."""
    lib = get_lib()
    if lib is None:
        return False
    sel = np.ascontiguousarray(sel, np.int64)
    indptr = np.ascontiguousarray(indptr, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    em_u8 = emask.view(np.uint8)
    lib.bucket_fill(
        len(sel), _p(sel, _I64P), _p(indptr, _I64P), _p(cols, _I64P),
        None if val is None else _p(np.ascontiguousarray(val, np.float32), _F32P),
        width, _p(nbr, _I32P), _p(em_u8, _U8P),
        None if val_out is None else _p(val_out, _F32P),
    )
    return True


def fill_dense_adj(edge_offsets, rows, cols, adj) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    B, P = adj.shape[0], adj.shape[1]
    lib.fill_dense_adj(
        B, P,
        _p(np.ascontiguousarray(edge_offsets, np.int64), _I64P),
        _p(np.ascontiguousarray(rows, np.int64), _I64P),
        _p(np.ascontiguousarray(cols, np.int64), _I64P),
        _p(adj.view(np.uint8), _U8P),
    )
    return True


def sample_neighbors_native(seeds, indptr, cols, fanout, sentinel, seed):
    """(nbr [n_seeds, fanout] int64, mask) or None without native lib."""
    lib = get_lib()
    if lib is None:
        return None
    seeds = np.ascontiguousarray(seeds, np.int64)
    out = np.empty((len(seeds), fanout), np.int32)
    mask = np.zeros((len(seeds), fanout), np.uint8)
    lib.sample_neighbors(
        len(seeds), _p(seeds, _I64P),
        _p(np.ascontiguousarray(indptr, np.int64), _I64P),
        _p(np.ascontiguousarray(cols, np.int64), _I64P),
        fanout, sentinel, np.uint64(seed), _p(out, _I32P), _p(mask, _U8P),
    )
    return out, mask.astype(bool)
