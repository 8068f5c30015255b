"""Native (C++) host runtime components, bound via ctypes (no pybind11 in
the image). Currently: the fast data-file table parser (datafile.cpp).

The library is built on demand with g++ and cached next to the source;
every consumer has a pure-Python fallback, so a missing toolchain degrades
gracefully rather than breaking."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "datafile.cpp")
_LIB = os.path.join(_HERE, "libtpusph_datafile.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The ctypes library handle, building it if needed; None if
    unavailable (callers must fall back)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.tpusph_parse_table.restype = ctypes.c_long
            lib.tpusph_parse_table.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
            lib.tpusph_count_rows.restype = ctypes.c_long
            lib.tpusph_count_rows.argtypes = [ctypes.c_char_p, ctypes.c_long]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def parse_table(text: str, nrows: int, ncols: int):
    """Parse a numeric table (nrows x ncols) from text. Returns a float32
    (nrows, ncols) array, or None if the native library is unavailable
    (caller falls back to numpy). Raises ValueError on malformed input."""
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode()
    out = np.empty((nrows, ncols), np.float32)
    got = lib.tpusph_parse_table(
        raw, len(raw), nrows, ncols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if got < 0:
        raise ValueError(
            f"malformed data-file row {-(got + 1)} (expected {ncols} columns)")
    if got != nrows:
        raise ValueError(f"expected {nrows} data rows, found {got}")
    return out
