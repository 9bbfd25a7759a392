"""ctypes bindings for the native DGB event reader (libdgbio.so).

Builds the shared library on first use if a compiler is available; all
call sites must tolerate `load()` returning None and fall back to the
pure-Python DGB reader (`dgcnn_tpu.io.dgb`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "event_reader.cpp")
_LIB = os.path.join(_DIR, "libdgbio.so")

_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> str | None:
    """Compile libdgbio.so; returns its path or None."""
    if not force and os.path.exists(_LIB) and os.path.getmtime(
        _LIB
    ) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


def load():
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.dgb_open.restype = ctypes.c_void_p
        lib.dgb_open.argtypes = [ctypes.c_char_p]
        lib.dgb_close.argtypes = [ctypes.c_void_p]
        lib.dgb_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
        lib.dgb_event_bounds.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.dgb_read_batch.restype = ctypes.c_int
        lib.dgb_read_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,   # batch
            ctypes.c_int64,   # n_pad
            ctypes.c_int64,   # crop
            ctypes.c_int32,   # crop_mode (0=random, 1=stride)
            ctypes.c_uint64,  # seed
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib
