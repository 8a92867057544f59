"""ctypes bindings for the native readahead batch cache (batch_cache.cpp)."""
from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np

from .build import build_library

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        path = build_library("batch_cache", extra_flags=("-lpthread",))
        if path is not None:
            _LIB = ctypes.CDLL(path)
            _LIB.bc_create.restype = ctypes.c_void_p
            _LIB.bc_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            _LIB.bc_write.restype = ctypes.c_int
            _LIB.bc_write.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int64,
            ]
            _LIB.bc_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            _LIB.bc_get.restype = ctypes.c_int
            _LIB.bc_get.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int64,
            ]
            _LIB.bc_destroy.argtypes = [ctypes.c_void_p]
    return _LIB


class NativeBatchCache:
    """Cache numpy minibatches to raw binary files and replay them with
    background readahead (next batch's disk read overlaps caller compute).

    Drop-in iterable like :class:`lagomorph_tpu.data.CachedDataLoader`;
    falls back to that class when the native library is unavailable.
    """

    def __init__(self, batches, cache_dir=None, progress_bar=False):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native batch_cache library unavailable")
        self._lib = lib
        batches = list(batches)
        self._meta = []  # (shape, dtype)
        if cache_dir is not None:
            os.makedirs(cache_dir, exist_ok=True)
        self._tmpdir = tempfile.TemporaryDirectory(
            dir=cache_dir, prefix="lagomorph_tpu.NativeBatchCache."
        )
        self._h = lib.bc_create(
            self._tmpdir.name.encode(), ctypes.c_int64(len(batches))
        )
        for i, b in enumerate(batches):
            b = np.ascontiguousarray(b)
            self._meta.append((b.shape, b.dtype))
            r = lib.bc_write(self._h, i, b.ctypes.data, b.nbytes)
            if r != 0:
                raise IOError(f"failed to write batch {i}")

    def __len__(self):
        return len(self._meta)

    def __getitem__(self, i):
        shape, dtype = self._meta[i]
        out = np.empty(shape, dtype=dtype)
        r = self._lib.bc_get(self._h, i, out.ctypes.data, out.nbytes)
        if r != 0:
            raise IOError(f"failed to read batch {i} (code {r})")
        # readahead the next batch in the background
        if i + 1 < len(self._meta):
            self._lib.bc_prefetch(self._h, i + 1)
        return out

    def __iter__(self):
        if len(self._meta) > 0:
            self._lib.bc_prefetch(self._h, 0)
        for i in range(len(self._meta)):
            yield self[i]

    def close(self):
        if getattr(self, "_h", None):
            self._lib.bc_destroy(self._h)
            self._h = None
            self._tmpdir.cleanup()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
