"""ctypes bindings for the native graph-preprocessing library.

Provides C++ implementations of the FlowGraph passes (graph/ldd.py) for
continental-scale grids; builds on demand (make) and falls back to the
NumPy implementations if the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgraph_preproc.so")
_lib = None


def load_library(build=True):
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    i64 = ctypes.c_int64
    lib.build_downstream.argtypes = [i8p, i64p, i64, i64, i32p, i64]
    lib.topo_distance.argtypes = [i32p, i64, i64p]
    lib.accuflux.argtypes = [i32p, i64p, f64p, i64, f64p]
    lib.catchment_labels.argtypes = [i32p, i64p, i64, i32p]
    lib.topo_order_down_first.argtypes = [i64p, i64, i64p]
    lib.pack_chunks.argtypes = [i32p, i64p, i64, i64, i64p]
    lib.pack_chunks.restype = i64
    _lib = lib
    return lib


def build_downstream(ldd2d_codes, land_lookup, P):
    lib = load_library()
    nrows, ncols = ldd2d_codes.shape
    out = np.empty(P, np.int32)
    lib.build_downstream(np.ascontiguousarray(ldd2d_codes, np.int8),
                         np.ascontiguousarray(land_lookup, np.int64),
                         nrows, ncols, out, P)
    return out


def topo_distance(downstream):
    lib = load_library()
    P = downstream.shape[0]
    dist = np.empty(P, np.int64)
    lib.topo_distance(np.ascontiguousarray(downstream, np.int32), P, dist)
    return dist


def topo_order_down_first(dist):
    lib = load_library()
    P = dist.shape[0]
    order = np.empty(P, np.int64)
    lib.topo_order_down_first(np.ascontiguousarray(dist, np.int64), P, order)
    return order


def accuflux(downstream, material):
    lib = load_library()
    P = downstream.shape[0]
    dist = topo_distance(downstream)
    order = topo_order_down_first(dist)[::-1].copy()  # headwaters first
    acc = np.empty(P, np.float64)
    lib.accuflux(np.ascontiguousarray(downstream, np.int32), order,
                 np.ascontiguousarray(material, np.float64), P, acc)
    return acc


def catchment_labels(downstream):
    lib = load_library()
    P = downstream.shape[0]
    dist = topo_distance(downstream)
    order = topo_order_down_first(dist)
    labels = np.empty(P, np.int32)
    lib.catchment_labels(np.ascontiguousarray(downstream, np.int32), order, P, labels)
    return labels


def pack_chunks(downstream, chunk_size=256):
    """Native build_schedule core: returns (chunks array (n, C) padded with
    P, chunk_of)."""
    lib = load_library()
    P = downstream.shape[0]
    dist = topo_distance(downstream)
    chunk_of = np.empty(P, np.int64)
    n = lib.pack_chunks(np.ascontiguousarray(downstream, np.int32), dist, P,
                        chunk_size, chunk_of)
    chunks = np.full((n, chunk_size), P, dtype=np.int32)
    # pixels must be inserted in packing order (headwaters first, stable);
    # chunk ids are assigned monotonically along that order, so the fill
    # position within a chunk is the rank inside its contiguous run
    order = np.lexsort((np.arange(P), -dist))
    seq = chunk_of[order]
    run_start = np.zeros(P, np.int64)
    new_run = np.flatnonzero(np.diff(seq) != 0) + 1
    run_start[new_run] = new_run
    np.maximum.accumulate(run_start, out=run_start)
    rank = np.arange(P) - run_start
    chunks[seq, rank] = order
    return chunks, chunk_of
