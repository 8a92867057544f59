"""ctypes bindings for the native CPU sampling kernels (cpu_kernels.cpp)."""
from __future__ import annotations

import ctypes

import numpy as np

from .build import build_library

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        path = build_library("cpu_kernels")
        if path is not None:
            _LIB = ctypes.CDLL(path)
    return _LIB


def _as_c(arr):
    return np.ascontiguousarray(arr)


def cpu_interp(I, u, dt=1.0):
    """Native CPU version of :func:`lagomorph_tpu.ops.interp.interp`.

    I: (nI, C, *sp) with nI in {1, n}; u: (n, dim, *sp).  float32/float64.
    Returns (n, C, *sp) numpy array.  Raises RuntimeError if the native
    library is unavailable.
    """
    lib = _lib()
    if lib is None:
        raise RuntimeError("native cpu_kernels library unavailable")
    I = _as_c(I)
    u = _as_c(u)
    dim = u.shape[1]
    if dim not in (2, 3):
        raise ValueError("only 2D/3D supported")
    if I.dtype not in (np.float32, np.float64):
        I = I.astype(np.float32)
    u = u.astype(I.dtype)
    n, nI, nc = u.shape[0], I.shape[0], I.shape[1]
    sp = np.asarray(I.shape[2:], dtype=np.int64)
    out = np.empty((n, nc) + tuple(sp), dtype=I.dtype)
    suffix = "f32" if I.dtype == np.float32 else "f64"
    fn = getattr(lib, f"interp{dim}d_{suffix}")
    ptr = np.ctypeslib.ndpointer
    fn.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_double,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
    ]
    fn(
        out.ctypes.data,
        I.ctypes.data,
        u.ctypes.data,
        float(dt),
        n,
        nI,
        nc,
        sp.ctypes.data,
    )
    return out


def cpu_affine_interp(I, A, T):
    """Native CPU version of affine_interp.  I: (nI, C, *sp); A: (n, d, d);
    T: (n, d)."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native cpu_kernels library unavailable")
    I = _as_c(I)
    dim = A.shape[1]
    if dim not in (2, 3):
        raise ValueError("only 2D/3D supported")
    if I.dtype not in (np.float32, np.float64):
        I = I.astype(np.float32)
    A = _as_c(A).astype(I.dtype)
    T = _as_c(T).astype(I.dtype)
    n, nI, nc = A.shape[0], I.shape[0], I.shape[1]
    sp = np.asarray(I.shape[2:], dtype=np.int64)
    out = np.empty((n, nc) + tuple(sp), dtype=I.dtype)
    suffix = "f32" if I.dtype == np.float32 else "f64"
    fn = getattr(lib, f"affine_interp{dim}d_{suffix}")
    fn.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
    ]
    fn(
        out.ctypes.data,
        I.ctypes.data,
        A.ctypes.data,
        T.ctypes.data,
        n,
        nI,
        nc,
        sp.ctypes.data,
    )
    return out
