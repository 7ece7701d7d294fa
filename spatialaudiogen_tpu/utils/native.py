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
            stale = not os.path.exists(_LIB_PATH)
            if not stale:
                lib_mtime = os.path.getmtime(_LIB_PATH)
                for sub in ("emd", "loader"):
                    subdir = os.path.join(_NATIVE_DIR, sub)
                    stale = stale or any(
                        os.path.getmtime(os.path.join(subdir, fn)) > lib_mtime
                        for fn in os.listdir(subdir) if fn.endswith(".cpp"))
            if stale:
                subprocess.run(["make", "-B", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=180)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.sag_emd_hat.restype = ctypes.c_double
            lib.sag_emd_hat.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                        _F64P, _F64P, _F64P, ctypes.c_double]
            lib.sag_emd_hat_batch.restype = None
            lib.sag_emd_hat_batch.argtypes = [
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                _F64P, _F64P, _F64P, ctypes.c_double, _F64P]
            lib.sag_decode_wav.restype = ctypes.c_long
            lib.sag_decode_wav.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_long, _F32P]
            _U8P = ctypes.POINTER(ctypes.c_uint8)
            _I32P = ctypes.POINTER(ctypes.c_int)
            lib.sag_jpeg_probe.restype = ctypes.c_int
            lib.sag_jpeg_probe.argtypes = [ctypes.c_char_p, _I32P, _I32P, _I32P]
            lib.sag_jpeg_decode_batch.restype = ctypes.c_int
            lib.sag_jpeg_decode_batch.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, _U8P]
            _lib = lib
        except Exception:
            _failed = True
            _lib = None
        return _lib
