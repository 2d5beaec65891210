"""ctypes loader for the native C++ CSR oracle (oracle.cpp).

Builds the shared library on first use with g++ -O3 (no pybind11 in the
image; plain C ABI + ctypes).  The native kernels are the exact CPU
comparator used by large-scale differential tests and CPU-baseline
benchmarks — the role of the reference's hand-written Rust CSR kernels
(src/graph_csr.rs:306-484).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "oracle.cpp")
_SO = os.path.join(_DIR, "liboracle.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    if (not os.path.exists(_SO)) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             "-pthread", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
        )
    return _SO


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_build())
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        _lib.spgemm_u64_symbolic.restype = ctypes.c_int64
        _lib.spgemm_u64_symbolic.argtypes = [
            ctypes.c_int64, i64p, i32p, u64p, i64p, i32p, u64p, i64p,
            ctypes.c_int32,
        ]
        _lib.spgemm_u64_numeric.restype = None
        _lib.spgemm_u64_numeric.argtypes = [
            ctypes.c_int64, i64p, i32p, u64p, i64p, i32p, u64p, i64p, i32p,
            u64p, ctypes.c_int32,
        ]
        _lib.spadd_u64.restype = ctypes.c_int64
        _lib.spadd_u64.argtypes = [
            ctypes.c_int64, i64p, i32p, u64p, i64p, i32p, u64p, i64p, i32p,
            u64p,
        ]
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


HostCsr = Tuple[np.ndarray, np.ndarray, np.ndarray]  # row_ptr i64, col i32, val u64


def as_host_csr(row_ptr, col_idx, values) -> HostCsr:
    return (
        np.ascontiguousarray(row_ptr, np.int64),
        np.ascontiguousarray(col_idx, np.int32),
        np.ascontiguousarray(values, np.uint64),
    )


def spgemm(a: HostCsr, b: HostCsr, n: int, n_threads: int = 0) -> HostCsr:
    """C = A x B on the saturating-u64 semiring (two-pass native kernel)."""
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    L = lib()
    arp, ac, av = a
    brp, bc, bv = b
    crp = np.zeros(n + 1, np.int64)
    nnz = L.spgemm_u64_symbolic(
        n, _ptr(arp, ctypes.c_int64), _ptr(ac, ctypes.c_int32),
        _ptr(av, ctypes.c_uint64), _ptr(brp, ctypes.c_int64),
        _ptr(bc, ctypes.c_int32), _ptr(bv, ctypes.c_uint64),
        _ptr(crp, ctypes.c_int64), n_threads,
    )
    cc = np.zeros(max(nnz, 1), np.int32)
    cv = np.zeros(max(nnz, 1), np.uint64)
    L.spgemm_u64_numeric(
        n, _ptr(arp, ctypes.c_int64), _ptr(ac, ctypes.c_int32),
        _ptr(av, ctypes.c_uint64), _ptr(brp, ctypes.c_int64),
        _ptr(bc, ctypes.c_int32), _ptr(bv, ctypes.c_uint64),
        _ptr(crp, ctypes.c_int64), _ptr(cc, ctypes.c_int32),
        _ptr(cv, ctypes.c_uint64), n_threads,
    )
    return crp, cc[:nnz], cv[:nnz]


def spadd(a: HostCsr, b: HostCsr, n: int) -> HostCsr:
    L = lib()
    arp, ac, av = a
    brp, bc, bv = b
    cap = len(ac) + len(bc)
    crp = np.zeros(n + 1, np.int64)
    cc = np.zeros(max(cap, 1), np.int32)
    cv = np.zeros(max(cap, 1), np.uint64)
    nnz = L.spadd_u64(
        n, _ptr(arp, ctypes.c_int64), _ptr(ac, ctypes.c_int32),
        _ptr(av, ctypes.c_uint64), _ptr(brp, ctypes.c_int64),
        _ptr(bc, ctypes.c_int32), _ptr(bv, ctypes.c_uint64),
        _ptr(crp, ctypes.c_int64), _ptr(cc, ctypes.c_int32),
        _ptr(cv, ctypes.c_uint64),
    )
    return crp, cc[:nnz], cv[:nnz]
