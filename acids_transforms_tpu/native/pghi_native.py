"""ctypes binding for the native exact-heap PGHI (native/pghi.cc)."""
from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from .build import is_built, lib_path

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not is_built():
        return None
    lib = ctypes.CDLL(lib_path())
    lib.att_pghi.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_double,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.att_pghi.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def pghi(
    mag: np.ndarray, gamma: float, n_fft: int, hop: int, tol: float
) -> np.ndarray:
    """Exact heap PGHI of one (T, F) magnitude spectrogram."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built — run python -m acids_transforms_tpu.native.build")
    mag = np.ascontiguousarray(mag, dtype=np.float32)
    T, F = mag.shape
    out = np.empty((T, F), dtype=np.float32)
    lib.att_pghi(
        mag.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        T,
        F,
        float(gamma),
        int(n_fft),
        int(hop),
        float(tol),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
