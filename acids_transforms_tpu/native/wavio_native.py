"""ctypes binding for the native WAV loader / resampler (native/wavio.cc)."""
from __future__ import annotations

import ctypes
from typing import Optional, Tuple

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
    lib.att_load_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.att_load_wav.restype = ctypes.c_int
    lib.att_save_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.c_int64,
        ctypes.c_int32,
    ]
    lib.att_save_wav.restype = ctypes.c_int
    lib.att_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.att_resample.restype = ctypes.c_int
    lib.att_free.argtypes = [ctypes.c_void_p]
    lib.att_free.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    out = ctypes.POINTER(ctypes.c_float)()
    ch = ctypes.c_int32()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.att_load_wav(path.encode(), ctypes.byref(out), ctypes.byref(ch), ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        raise ValueError("att_load_wav failed with code %d for %s" % (rc, path))
    arr = np.ctypeslib.as_array(out, shape=(ch.value, n.value)).copy()
    lib.att_free(out)
    return arr, int(sr.value)


def save_wav(path: str, x: np.ndarray, sr: int = 44100) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    x = np.ascontiguousarray(x, dtype=np.float32)
    if x.ndim == 1:
        x = x[None, :]
    rc = lib.att_save_wav(
        path.encode(),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.shape[0],
        x.shape[1],
        int(sr),
    )
    if rc != 0:
        raise ValueError("att_save_wav failed with code %d" % rc)


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    x = np.ascontiguousarray(x, dtype=np.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    out = ctypes.POINTER(ctypes.c_float)()
    n_out = ctypes.c_int64()
    rc = lib.att_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.shape[0],
        x.shape[1],
        int(sr_in),
        int(sr_out),
        ctypes.byref(out),
        ctypes.byref(n_out),
    )
    if rc != 0:
        raise ValueError("att_resample failed with code %d" % rc)
    arr = np.ctypeslib.as_array(out, shape=(x.shape[0], n_out.value)).copy()
    lib.att_free(out)
    return arr[0] if squeeze else arr
