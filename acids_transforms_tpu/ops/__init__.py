"""Numerical kernels: framing, windows, FFT/DFT, mel, mu-law, phase, PGHI."""
from . import fft, framing, griffinlim, interp, mel, mulaw, pghi, phase, windows
from .fft import istft, matmul_precision, set_matmul_precision, stft
from .framing import frame, overlap_add, pad_axis, reshape_batches

__all__ = [
    "fft",
    "framing",
    "griffinlim",
    "interp",
    "mel",
    "mulaw",
    "pghi",
    "phase",
    "windows",
    "stft",
    "istft",
    "set_matmul_precision",
    "matmul_precision",
    "frame",
    "overlap_add",
    "pad_axis",
    "reshape_batches",
]
