"""Native (C++) host-runtime kernels, loaded via ctypes.

The shared library is built on demand with g++ (cached next to the
source); everything degrades gracefully to the pure-Python implementations
when no compiler is available (``available`` is False then).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lis_native.cpp")
_SO = os.path.join(_HERE, f"lis_native_{sys.implementation.cache_tag}.so")

_lib = None
available = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load():
    global _lib, available
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.iluk_factor.restype = ctypes.c_int
    lib.iluk_factor.argtypes = [
        ctypes.c_int32, i32p, i32p, f64p, ctypes.c_int32,
        ctypes.POINTER(i32p), ctypes.POINTER(i32p), ctypes.POINTER(f64p),
        ctypes.POINTER(ctypes.c_int64)]
    lib.ilut_factor.restype = ctypes.c_int
    lib.ilut_factor.argtypes = [
        ctypes.c_int32, i32p, i32p, f64p, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(i32p), ctypes.POINTER(i32p), ctypes.POINTER(f64p),
        ctypes.POINTER(ctypes.c_int64)]
    lib.iluc_factor.restype = ctypes.c_int
    lib.iluc_factor.argtypes = [
        ctypes.c_int32, i32p, i32p, f64p, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(i32p), ctypes.POINTER(i32p), ctypes.POINTER(f64p),
        ctypes.POINTER(ctypes.c_int64)]
    lib.sainv_factor.restype = ctypes.c_int
    lib.sainv_factor.argtypes = [
        ctypes.c_int32, i32p, i32p, f64p, ctypes.c_double,
        ctypes.POINTER(i32p), ctypes.POINTER(i32p), ctypes.POINTER(f64p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(i32p), ctypes.POINTER(i32p), ctypes.POINTER(f64p),
        ctypes.POINTER(ctypes.c_int64), f64p]
    lib.amg_aggregate.restype = ctypes.c_int32
    lib.amg_aggregate.argtypes = [ctypes.c_int32, i32p, i32p, i32p]
    lib.level_schedule.restype = ctypes.c_int32
    lib.level_schedule.argtypes = [ctypes.c_int32, i32p, i32p,
                                   ctypes.c_int32, i32p]
    lib.mm_parse_coords.restype = ctypes.c_int64
    lib.mm_parse_coords.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int32,
                                    i32p, i32p, f64p]
    lib.lis_native_free.restype = None
    lib.lis_native_free.argtypes = [ctypes.c_void_p]
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.euler_split.restype = ctypes.c_int
    lib.euler_split.argtypes = [
        ctypes.c_int64, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    available = True
    return lib


def _as_i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _as_f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _take_csr(lib, n, optr, oidx, oval, nnz):
    ptr = np.ctypeslib.as_array(optr, shape=(n + 1,)).copy()
    index = np.ctypeslib.as_array(oidx, shape=(nnz,)).copy()
    value = np.ctypeslib.as_array(oval, shape=(nnz,)).copy()
    lib.lis_native_free(optr)
    lib.lis_native_free(oidx)
    lib.lis_native_free(oval)
    return ptr, index, value


def iluk_factor(ptr, index, value, fill: int):
    """Returns combined-LU CSR arrays (L strictly lower with factors,
    U upper with diagonal), or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(ptr) - 1
    ptr = np.ascontiguousarray(ptr, dtype=np.int32)
    index = np.ascontiguousarray(index, dtype=np.int32)
    value = np.ascontiguousarray(value, dtype=np.float64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    optr, oidx, oval = i32p(), i32p(), f64p()
    nnz = ctypes.c_int64()
    rc = lib.iluk_factor(n, _as_i32p(ptr), _as_i32p(index), _as_f64p(value),
                         int(fill), ctypes.byref(optr), ctypes.byref(oidx),
                         ctypes.byref(oval), ctypes.byref(nnz))
    if rc != 0:
        return None
    return _take_csr(lib, n, optr, oidx, oval, nnz.value)


def ilut_factor(ptr, index, value, drop: float, rate: float):
    lib = _load()
    if lib is None:
        return None
    n = len(ptr) - 1
    ptr = np.ascontiguousarray(ptr, dtype=np.int32)
    index = np.ascontiguousarray(index, dtype=np.int32)
    value = np.ascontiguousarray(value, dtype=np.float64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    optr, oidx, oval = i32p(), i32p(), f64p()
    nnz = ctypes.c_int64()
    rc = lib.ilut_factor(n, _as_i32p(ptr), _as_i32p(index), _as_f64p(value),
                         float(drop), float(rate), ctypes.byref(optr),
                         ctypes.byref(oidx), ctypes.byref(oval),
                         ctypes.byref(nnz))
    if rc != 0:
        return None
    return _take_csr(lib, n, optr, oidx, oval, nnz.value)


def iluc_factor(ptr, index, value, drop: float, rate: float):
    """True Crout ILU factorisation (reference lis_precon_iluc.c:67);
    returns combined-LU CSR arrays or None if native code is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(ptr) - 1
    ptr = np.ascontiguousarray(ptr, dtype=np.int32)
    index = np.ascontiguousarray(index, dtype=np.int32)
    value = np.ascontiguousarray(value, dtype=np.float64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    optr, oidx, oval = i32p(), i32p(), f64p()
    nnz = ctypes.c_int64()
    rc = lib.iluc_factor(n, _as_i32p(ptr), _as_i32p(index), _as_f64p(value),
                         float(drop), float(rate), ctypes.byref(optr),
                         ctypes.byref(oidx), ctypes.byref(oval),
                         ctypes.byref(nnz))
    if rc != 0:
        return None
    return _take_csr(lib, n, optr, oidx, oval, nnz.value)


def sainv_factor(ptr, index, value, tol: float):
    """Sparse stabilised A-biconjugation (reference
    lis_precon_create_sainv_csr, lis_precon_sainv.c:59).  Returns
    ((zptr,zidx,zval), (wptr,widx,wval), dinv) with Z/W as row-wise CSR,
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(ptr) - 1
    ptr = np.ascontiguousarray(ptr, dtype=np.int32)
    index = np.ascontiguousarray(index, dtype=np.int32)
    value = np.ascontiguousarray(value, dtype=np.float64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    zp, zi, zv = i32p(), i32p(), f64p()
    wp, wi, wv = i32p(), i32p(), f64p()
    znnz, wnnz = ctypes.c_int64(), ctypes.c_int64()
    dinv = np.zeros(n, dtype=np.float64)
    rc = lib.sainv_factor(n, _as_i32p(ptr), _as_i32p(index), _as_f64p(value),
                          float(tol),
                          ctypes.byref(zp), ctypes.byref(zi), ctypes.byref(zv),
                          ctypes.byref(znnz),
                          ctypes.byref(wp), ctypes.byref(wi), ctypes.byref(wv),
                          ctypes.byref(wnnz), _as_f64p(dinv))
    if rc != 0:
        return None
    Z = _take_csr(lib, n, zp, zi, zv, znnz.value)
    W = _take_csr(lib, n, wp, wi, wv, wnnz.value)
    return Z, W, dinv


def amg_aggregate(ptr, index):
    """Greedy independent-set aggregation of a strength graph (SA-AMG
    setup; reference lis_m_aggregate_mod.F90:45).  Returns (nagg, agg)
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(ptr) - 1
    ptr = np.ascontiguousarray(ptr, dtype=np.int32)
    index = np.ascontiguousarray(index, dtype=np.int32)
    agg = np.empty(n, dtype=np.int32)
    nagg = lib.amg_aggregate(n, _as_i32p(ptr), _as_i32p(index),
                             _as_i32p(agg))
    return int(nagg), agg


def level_schedule(ptr, index, lower: bool):
    """Levels for a strictly-triangular CSR; returns (nlev, lev array)."""
    lib = _load()
    if lib is None:
        return None
    n = len(ptr) - 1
    ptr = np.ascontiguousarray(ptr, dtype=np.int32)
    index = np.ascontiguousarray(index, dtype=np.int32)
    lev = np.zeros(n, dtype=np.int32)
    nlev = lib.level_schedule(n, _as_i32p(ptr), _as_i32p(index),
                              1 if lower else 0, _as_i32p(lev))
    return int(nlev), lev


def mm_parse_coords(path: str, skip_lines: int, nnz: int, pattern: bool):
    lib = _load()
    if lib is None:
        return None
    rows = np.empty(nnz, dtype=np.int32)
    cols = np.empty(nnz, dtype=np.int32)
    vals = np.empty(nnz, dtype=np.float64)
    got = lib.mm_parse_coords(path.encode(), skip_lines, nnz,
                              1 if pattern else 0,
                              _as_i32p(rows), _as_i32p(cols), _as_f64p(vals))
    if got != nnz:
        return None
    return rows, cols, vals


def ilu0_dia(offsets, diags):
    """In-place ILU(0) on DIA storage; diags (nnd, n) float64 C-contiguous.
    Returns the factored array or None if native code is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "ilu0_dia"):
        return None
    d = np.ascontiguousarray(diags, dtype=np.float64)
    offs = np.ascontiguousarray(offsets, dtype=np.int64)
    lib.ilu0_dia.restype = ctypes.c_int
    rc = lib.ilu0_dia(
        ctypes.c_int64(d.shape[1]), ctypes.c_int32(d.shape[0]),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return d if rc == 0 else None


def euler_split(u, v, nu: int, nv: int):
    """One Euler-orientation split of an even-regular bipartite multigraph
    (edges u[i]->v[i]); returns a 0/1 bit per edge such that every node's
    incident edges split exactly in half.  The inner step of the Benes
    shuffle-network routing (ops/shuffle.py).  None when native code is
    unavailable (the caller falls back to a pure-Python walk)."""
    lib = _load()
    if lib is None:
        return None
    u = np.ascontiguousarray(u, dtype=np.int64)
    v = np.ascontiguousarray(v, dtype=np.int64)
    bit = np.empty(len(u), dtype=np.uint8)
    lib.euler_split(len(u),
                    u.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    nu, nv, bit.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_uint8)))
    return bit


def greedy_color(left, right, n_nodes: int, d: int):
    """Sequential greedy proper edge coloring with d <= 128 colors
    (first-free bitmask pick).  Returns (fails, color) or None when the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "greedy_color"):
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.greedy_color.restype = ctypes.c_int64
    lib.greedy_color.argtypes = [ctypes.c_int64, i64p, i64p,
                                 ctypes.c_int64, ctypes.c_int32,
                                 ctypes.POINTER(ctypes.c_int32)]
    left = np.ascontiguousarray(left, dtype=np.int64)
    right = np.ascontiguousarray(right, dtype=np.int64)
    color = np.empty(len(left), dtype=np.int32)
    fails = lib.greedy_color(
        len(left), left.ctypes.data_as(i64p), right.ctypes.data_as(i64p),
        n_nodes, d, _as_i32p(color))
    return int(fails), color


def pass_idx(pos_before, pos_after, d: int, s: int, M: int,
             exact_holes: bool):
    """Lane-shuffle gather table for one Benes pass (the native fast
    path of ops/shuffle._pass_idx): (M/128, 128) int32, with per-row
    hole/unread pairing under exact_holes.  None when the native
    library is unavailable (numpy fallback in the caller)."""
    lib = _load()
    if lib is None or not hasattr(lib, "pass_idx"):
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.pass_idx.restype = ctypes.c_int
    lib.pass_idx.argtypes = [ctypes.c_int64, i64p, i64p,
                             ctypes.c_int64, ctypes.c_int64,
                             ctypes.c_int64, ctypes.c_int,
                             ctypes.POINTER(ctypes.c_int32)]
    pb = np.ascontiguousarray(pos_before, dtype=np.int64)
    pa = np.ascontiguousarray(pos_after, dtype=np.int64)
    idx = np.empty(M, dtype=np.int32)
    rc = lib.pass_idx(len(pb), pb.ctypes.data_as(i64p),
                      pa.ctypes.data_as(i64p), d, s, M,
                      1 if exact_holes else 0, _as_i32p(idx))
    return idx.reshape(M // 128, 128) if rc == 0 else None
