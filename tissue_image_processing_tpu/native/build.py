"""On-demand g++ build + ctypes loading for the native host kernels."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (once) and load libtipws.so; returns None if no toolchain."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_SRC_DIR, "watershed.cpp")
        # Content-hash staleness check: the .so is never committed, and mtime
        # comparison is unreliable after a fresh checkout (equal mtimes would
        # load a binary compiled with -march=native on another machine).
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so_path = os.path.join(_SRC_DIR, f"libtipws-{digest}.so")
        try:
            if not os.path.isfile(so_path):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
                     "-o", so_path],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(so_path)
            lib.watershed.restype = ctypes.c_int32
            lib.watershed.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
            lib.regional_minima.restype = ctypes.c_int32
            lib.regional_minima.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32)]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB
