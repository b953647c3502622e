"""Utility layer: audio IO, profiling, numerical guards."""
from .debug import assert_finite, checked
from .misc import import_data, load_wav, resample, save_wav
from .profiling import annotate, device_timeit, trace

__all__ = [
    "import_data",
    "load_wav",
    "save_wav",
    "resample",
    "trace",
    "annotate",
    "device_timeit",
    "checked",
    "assert_finite",
]
