"""MFCC: mel-spectrogram transform (reference transforms/mel.py).

Note the reference ``MFCC`` is a misnomer — it wraps
``torchaudio.transforms.MelSpectrogram`` with no DCT (mel.py:31-44).  The
same behaviour is kept: power spectrogram -> rectangular mel filterbank GEMM,
output layout ``(..., n_mels, frames)`` (torchaudio's bin-major layout, which
the reference does *not* transpose).  Not invertible (mel.py:75-77).

TPU notes: power-spec + mel projection is one GEMM against the precomputed
bank, fused with the spectral frames produced by the shared STFT engine.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.fft import matmul_precision, stft as stft_op
from ..ops.mel import mel_banks
from ..ops.windows import hann_window
from .base import AudioTransform, NotInvertibleError
from .norm import Normalize

__all__ = ["MFCC"]


class MFCC(AudioTransform):
    scriptable = True
    invertible = False

    _leaves = ("window", "mel_bank", "norm")

    def __init__(
        self,
        n_fft: int = 1024,
        hop_length: int = 256,
        power: float = 2.0,
        n_mels: int = 128,
        sr: int = 44100,
        norm_mode: Optional[str] = None,
        impl: str = "auto",
    ):
        super().__init__(sr=sr)
        self.n_fft = int(n_fft)
        self.hop_length = int(hop_length)
        self.power = float(power)
        self.n_mels = int(n_mels)
        self.impl = impl
        self.norm = Normalize(mode=norm_mode) if norm_mode is not None else None
        self.window = hann_window(self.n_fft)
        self.mel_bank = jnp.asarray(mel_banks(self.n_fft, sr, self.n_mels))

    @property
    def needs_scaling(self) -> bool:
        return self.norm is not None

    @property
    def ratio(self) -> int:
        return self.hop_length

    def _melspec(self, x: jnp.ndarray) -> jnp.ndarray:
        spec = stft_op(x, self.n_fft, self.hop_length, self.window, impl=self.impl)
        p = jnp.abs(spec) ** self.power  # (..., T, F)
        mel = jnp.matmul(p, self.mel_bank, precision=matmul_precision())
        return jnp.swapaxes(mel, -2, -1)  # (..., n_mels, T) — torchaudio layout

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        y = self._melspec(x)
        if self.norm is not None:
            y = self.norm.forward(y)
        return y

    def fit(self, x: jnp.ndarray) -> "MFCC":
        if self.norm is None:
            return self
        # reference fits the norm on the *raw input* handed to scale_data
        # (mel.py:60-63) — kept for parity.
        return self.replace(norm=self.norm.fit(x))

    def forward_with_time(self, x, time):
        y = self.forward(x)
        n_chunks = y.shape[-1]  # frame axis is -1 in the mel layout
        # (the reference derives chunk count from axis -2 = n_mels, a bug —
        # mel.py:48-57; corrected here.)
        shifts = jnp.arange(n_chunks) * (self.hop_length / self.sr)
        return y, shifts + time[..., None]

    def invert(self, x, inversion_mode=None, key=None):
        raise NotInvertibleError
