"""Shared loader for the native C++ library (EMD solver + audio decoder).

Builds native/ once per process on demand (make) and configures the ctypes
signatures. Returns None when no toolchain is available — callers keep a
pure-Python fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_REPO_ROOT = os.path.realpath(os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libsagnative.so")
_lock = threading.Lock()
_lib = None
_failed = False

_F64P = ctypes.POINTER(ctypes.c_double)
_F32P = ctypes.POINTER(ctypes.c_float)


def load_native():
    """Build (if needed) and load libsagnative; None on failure."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=180)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.sag_emd_hat.restype = ctypes.c_double
            lib.sag_emd_hat.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                        _F64P, _F64P, _F64P, ctypes.c_double]
            lib.sag_emd_hat_batch.restype = None
            lib.sag_emd_hat_batch.argtypes = [
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                _F64P, _F64P, _F64P, ctypes.c_double, _F64P]
            lib.sag_read_window.restype = ctypes.c_int
            lib.sag_read_window.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_long, ctypes.c_long,
                ctypes.c_long, ctypes.c_int, _F32P, _F32P]
            _lib = lib
        except Exception:
            _failed = True
            _lib = None
        return _lib
