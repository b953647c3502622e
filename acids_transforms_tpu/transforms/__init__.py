"""Flat transform namespace (reference acids_transforms/transforms/__init__.py:1-9)."""
from .base import (
    AudioTransform,
    ComposeAudioTransform,
    InversionEnumType,
    NotInvertibleError,
    apply_invert_transform_to_list,
    apply_transform_to_list,
)
from .dgt import DGT, RealtimeDGT
from .mel import MFCC
from .misc import OneHot, Squeeze, Transpose, Unsqueeze
from .norm import Normalize
from .oadd import OverlapAdd
from .raw import MidSide, Mono, MuLaw, Stereo, Window
from .spectral_repr import (
    IF,
    Cartesian,
    Dummy,
    Imaginary,
    Magnitude,
    Phase,
    Polar,
    PolarIF,
    Real,
    SpectralRepresentation,
)
from .stft import STFT, RealtimeSTFT

__all__ = [
    "AudioTransform",
    "ComposeAudioTransform",
    "NotInvertibleError",
    "InversionEnumType",
    "apply_transform_to_list",
    "apply_invert_transform_to_list",
    "Mono",
    "Stereo",
    "MidSide",
    "Window",
    "MuLaw",
    "STFT",
    "RealtimeSTFT",
    "DGT",
    "RealtimeDGT",
    "MFCC",
    "Dummy",
    "Real",
    "Imaginary",
    "Magnitude",
    "Phase",
    "IF",
    "SpectralRepresentation",
    "Cartesian",
    "Polar",
    "PolarIF",
    "Normalize",
    "OverlapAdd",
    "Unsqueeze",
    "Squeeze",
    "Transpose",
    "OneHot",
]
