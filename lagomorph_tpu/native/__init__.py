"""Native (C++) host-side components.

* :mod:`cpu_kernels` — CPU reference implementations of the sampling ops
  (ctypes bindings to ``cpu_kernels.cpp``), the independent oracle for the
  parity test-suite and a host-side fast path (the role of the reference's
  ``extension/cpu/affine.cpp``).
* :mod:`batch_cache` — threaded raw-binary minibatch cache with background
  readahead (ctypes bindings to ``batch_cache.cpp``), the native backend for
  :class:`lagomorph_tpu.data.CachedDataLoader`-style replay.

Both build lazily with g++ on first use and degrade gracefully (pure-Python
fallbacks) when a toolchain is unavailable.
"""
from .build import build_library, native_available
from .cpu_kernels import cpu_interp, cpu_affine_interp
from .batch_cache import NativeBatchCache

__all__ = [
    "build_library",
    "native_available",
    "cpu_interp",
    "cpu_affine_interp",
    "NativeBatchCache",
]
