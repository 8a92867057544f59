"""Lazy g++ build of the native shared libraries, cached next to the
sources (rebuilt when the source mtime is newer than the .so)."""
from __future__ import annotations

import os
import shutil
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_CACHE: dict = {}


def native_available() -> bool:
    return shutil.which("g++") is not None


def build_library(name: str, extra_flags=()) -> str | None:
    """Compile ``<name>.cpp`` into ``lib<name>.so`` beside this file and
    return its path, or None if no toolchain is available / build fails."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_HERE, f"{name}.cpp")
        out = os.path.join(_HERE, f"lib{name}.so")
        if not os.path.isfile(src):
            _CACHE[name] = None
            return None
        if os.path.isfile(out) and os.path.getmtime(out) >= os.path.getmtime(src):
            _CACHE[name] = out
            return out
        if not native_available():
            _CACHE[name] = None
            return None
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out, src]
        cmd += list(extra_flags)
        # OpenMP if available (best effort)
        try:
            r = subprocess.run(
                cmd + ["-fopenmp"], capture_output=True, text=True, timeout=240
            )
            if r.returncode != 0:
                r = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
            if r.returncode != 0:
                import warnings

                warnings.warn(f"native build of {name} failed:\n{r.stderr[-2000:]}")
                _CACHE[name] = None
                return None
        except Exception:
            _CACHE[name] = None
            return None
        _CACHE[name] = out
        return out
