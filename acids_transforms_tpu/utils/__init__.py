"""Utility layer: audio IO, bucketing, profiling, numerical guards."""
from .bucketing import default_buckets, frame_mask, pad_to_bucket
from .debug import assert_finite, checked
from .hlo import collective_violations
from .misc import import_data, load_wav, resample, save_wav
from .profiling import annotate, device_timeit, trace

__all__ = [
    "collective_violations",
    "import_data",
    "load_wav",
    "save_wav",
    "resample",
    "trace",
    "annotate",
    "device_timeit",
    "checked",
    "assert_finite",
    "default_buckets",
    "pad_to_bucket",
    "frame_mask",
]
