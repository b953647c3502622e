"""Auto-dispatch region table: the single source of the numeric gates.

``backend="auto"`` dispatchers pick between Pallas kernels, closed forms
and XLA/generic paths inside *measured* win regions (BENCH_NOTES.md
sweeps).  Those regions used to live as scattered hand-written constants
in ``fuse.py`` / ``streaming.py`` (VERDICT r3 weak #6); they now load
from ``dispatch_regions.json`` (checked in, one value per gate with its
measurement rationale) through this module, and the conformance suite
(tests/test_regions.py) asserts the live dispatch decisions match the
table across the documented matrix — a silent drift between code and
table fails loudly.
"""
from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Optional

__all__ = [
    "table",
    "melspec_region_ok",
    "repr_region_ok",
    "mfcc_region_ok",
    "fit_fullk_max_n_fft",
    "angle_cap_bytes",
    "sinebank_cap_bytes",
    "batch_cap",
]


@lru_cache(maxsize=None)
def table() -> dict:
    path = os.path.join(os.path.dirname(__file__), "dispatch_regions.json")
    with open(path) as f:
        return json.load(f)


def _in_shape_region(r: dict, n_fft: int, overlap: int) -> bool:
    return (
        r["n_fft_min"] <= n_fft <= r["n_fft_max"]
        and overlap >= r["overlap_min"]
    )


def melspec_region_ok(n_fft: int, hop_length: int, has_taps: bool) -> bool:
    """The fused-forward shape region shared by every melspec kernel.

    Cosine-sum (taps) windows use the chunk-factored kernel region;
    full-K (e.g. gaussian DGT) windows additionally require the
    nyquist-depadded lane layout (ops/pallas/spectral.py:_nyq_depad)."""
    t = table()["fuse_forward"]
    overlap = n_fft // hop_length
    if has_taps:
        return _in_shape_region(t["melspec_taps"], n_fft, overlap)
    r = t["melspec_fullk"]
    if not _in_shape_region(r, n_fft, overlap):
        return False
    if r.get("requires_nyq_depad"):
        from .ops.pallas.spectral import _nyq_depad

        return bool(_nyq_depad(n_fft, hop_length))
    return True


def repr_region_ok(
    n_fft: int, hop_length: int, has_taps: bool, second: str
) -> bool:
    """Auto region for the fused two-channel representation kernels."""
    t = table()["fuse_forward"]
    overlap = n_fft // hop_length
    if second == "if":  # same_as melspec regions
        return melspec_region_ok(n_fft, hop_length, has_taps)
    r = t["repr_phase_imag"]
    if r.get("taps_only") and not has_taps:
        return False
    return _in_shape_region(r, n_fft, overlap)


def mfcc_region_ok(n_fft: int, hop_length: int) -> bool:
    return _in_shape_region(
        table()["fuse_forward"]["mfcc"], n_fft, n_fft // hop_length
    )


def fit_fullk_max_n_fft() -> int:
    return int(table()["fuse_fit"]["fullk_n_fft_max"])


def angle_cap_bytes() -> int:
    return int(table()["streaming"]["angle_cap_bytes"])


def sinebank_cap_bytes() -> int:
    return int(table()["streaming"]["sinebank_cap_bytes"])


def batch_cap(mode: str) -> Optional[int]:
    """Auto-dispatch batch ceiling for a streaming session kernel mode
    (``None`` = the kernel wins at every measured batch)."""
    cap = table()["streaming"]["batch_caps"][mode]
    return None if cap is None else int(cap)
