"""ctypes binding for the native C++ CSV ingest (native/ingest.cpp).

The native loader parses, site-indexes, and densifies a KAUST CSV in one
C++ pass. Semantics are bit-identical to the pandas path in
st_dadk_tpu.dataio.kaust (first-appearance site order, 1-based t, NaN
holes); tests/test_native_ingest.py cross-checks the two. Falls back
silently when the shared library has not been built (`make native`).
"""
from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_PATHS = [
    Path(__file__).resolve().parent.parent.parent / "native" / "libstdadk_ingest.so",
]

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    for p in _LIB_PATHS:
        if p.exists():
            try:
                lib = ctypes.CDLL(str(p))
                lib.stdadk_load_csv.restype = ctypes.c_int
                lib.stdadk_load_csv.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                ]
                lib.stdadk_free.restype = None
                lib.stdadk_free.argtypes = [ctypes.c_void_p]
                _lib = lib
                return _lib
            except (OSError, AttributeError):
                # AttributeError: a stale/incompatible .so missing the
                # expected symbol must fall back to pandas like a missing
                # library, not crash every load
                break
    _load_failed = True
    return None


def native_available() -> bool:
    return _get_lib() is not None


def load_csv_native(path: str | Path
                    ) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Returns (z (T,S) float32, coords (S,2) float64, n_rows) or None when
    the native library is unavailable or parsing fails.

    Coords come back as the exact parsed doubles so the site index matches
    the pandas path's float64 factorize semantics; callers downcast to
    float32 for device arrays."""
    lib = _get_lib()
    if lib is None:
        return None
    z_ptr = ctypes.POINTER(ctypes.c_float)()
    c_ptr = ctypes.POINTER(ctypes.c_double)()
    T = ctypes.c_int64()
    S = ctypes.c_int64()
    rows = ctypes.c_int64()
    rc = lib.stdadk_load_csv(str(path).encode(), ctypes.byref(z_ptr),
                             ctypes.byref(c_ptr), ctypes.byref(T),
                             ctypes.byref(S), ctypes.byref(rows))
    if rc != 0:
        return None
    try:
        t, s = T.value, S.value
        z = np.ctypeslib.as_array(z_ptr, shape=(t, s)).copy()
        coords = np.ctypeslib.as_array(c_ptr, shape=(s, 2)).copy()
    finally:
        lib.stdadk_free(z_ptr)
        lib.stdadk_free(c_ptr)
    return z, coords, rows.value
