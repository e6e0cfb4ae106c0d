"""ctypes bindings for the native runtime (native/psignncore.cpp).

Builds on demand with ``make -C native`` (g++); every entry point has a
pure-Python fallback so the framework runs without the native build.  The
native paths cover the offline/IO-side hot loops — P1 assembly, the
Dirichlet-reduced CG solve, RCM ordering, fused-MP block packing — i.e. the
roles FEniCS/gmsh (C++) play for the reference (SURVEY.md D1/D2).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpsignncore.so")
_lib = None
_build_attempted = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           capture_output=True, check=True)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.assemble_p1_coo.argtypes = [
        _f64p, ctypes.c_int64, _i32p, ctypes.c_int64, _i32p, _i32p, _f64p]
    lib.assemble_load.argtypes = [
        _f64p, _i32p, ctypes.c_int64, _f64p, _f64p, _f64p,
        ctypes.c_int64, _f64p]
    lib.solve_cg.restype = ctypes.c_int32
    lib.solve_cg.argtypes = [
        _i64p, _i32p, _f64p, ctypes.c_int64, _f64p, _f64p,
        ctypes.c_double, ctypes.c_int32]
    lib.rcm_order.argtypes = [_i64p, _i32p, ctypes.c_int64, _i32p]
    lib.pack_mp_blocks_core.restype = ctypes.c_int32
    lib.pack_mp_blocks_core.argtypes = [
        _i32p, _i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, _i32p, _i32p, _f32p, _i32p, _i64p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def assemble_p1_coo(pts: np.ndarray, tris: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(rows, cols, vals) COO triplets of the P1 stiffness matrix."""
    lib = _load()
    pts = np.ascontiguousarray(pts, np.float64)
    tris = np.ascontiguousarray(tris, np.int32)
    ntri = len(tris)
    rows = np.empty(9 * ntri, np.int32)
    cols = np.empty(9 * ntri, np.int32)
    vals = np.empty(9 * ntri, np.float64)
    if lib is None:
        raise RuntimeError("native library unavailable")
    lib.assemble_p1_coo(pts, len(pts), tris, ntri, rows, cols, vals)
    return rows, cols, vals


def assemble_load(pts: np.ndarray, tris: np.ndarray, fq: np.ndarray,
                  lam: np.ndarray, w: np.ndarray, npts: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    b = np.zeros(npts, np.float64)
    lib.assemble_load(
        np.ascontiguousarray(pts, np.float64),
        np.ascontiguousarray(tris, np.int32), len(tris),
        np.ascontiguousarray(fq, np.float64),
        np.ascontiguousarray(lam, np.float64),
        np.ascontiguousarray(w, np.float64), lam.shape[0], b)
    return b


def solve_cg(indptr, indices, data, b, tol=1e-12, maxiter=10000):
    """Jacobi-CG solve of an SPD CSR system; returns (x, iterations)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(b)
    x = np.zeros(n, np.float64)
    it = lib.solve_cg(
        np.ascontiguousarray(indptr, np.int64),
        np.ascontiguousarray(indices, np.int32),
        np.ascontiguousarray(data, np.float64), n,
        np.ascontiguousarray(b, np.float64), x, tol, maxiter)
    if it < 0:
        raise RuntimeError("CG did not converge")
    return x, int(it)


def rcm_order(indptr, indices, n) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    perm = np.empty(n, np.int32)
    lib.rcm_order(np.ascontiguousarray(indptr, np.int64),
                  np.ascontiguousarray(indices, np.int32), n, perm)
    return perm


def pack_mp_blocks_core(agg, oth, n_node_cap, block_n, e_cap):
    """Native edge-block packing; returns (agg_local, oth_global, mask,
    win_start, max_need) or raises if e_cap too small."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n_blocks = n_node_cap // block_n
    agg_local = np.zeros((n_blocks, e_cap), np.int32)
    oth_global = np.zeros((n_blocks, e_cap), np.int32)
    mask = np.zeros((n_blocks, e_cap), np.float32)
    win_start = np.zeros(n_blocks, np.int32)
    fill = np.zeros(n_blocks, np.int64)
    need = lib.pack_mp_blocks_core(
        np.ascontiguousarray(agg, np.int32),
        np.ascontiguousarray(oth, np.int32), len(agg), n_node_cap,
        block_n, e_cap, agg_local, oth_global, mask, win_start, fill)
    if need < 0:
        raise ValueError("e_cap too small for block packing")
    # live-block grid: drop trailing all-padding blocks, matching the Python
    # pack (kernels/fused_mp.pack_mp_blocks) which sizes the kernel grid by
    # the last aggregation node that actually has edges
    live = np.nonzero(fill)[0]
    n_live = max(1, int(live[-1]) + 1) if len(live) else 1
    return (agg_local[:n_live], oth_global[:n_live], mask[:n_live],
            win_start[:n_live], int(need))
