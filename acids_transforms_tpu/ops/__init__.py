"""Numerical kernels: framing, windows, FFT/DFT, mel, mu-law, phase, PGHI."""
from . import fft, framing, griffinlim, interp, mel, mulaw, phase, windows
from .fft import istft, stft
from .framing import frame, overlap_add, pad_axis, reshape_batches

__all__ = [
    "fft",
    "framing",
    "griffinlim",
    "interp",
    "mel",
    "mulaw",
    "phase",
    "windows",
    "stft",
    "istft",
    "frame",
    "overlap_add",
    "pad_axis",
    "reshape_batches",
]
