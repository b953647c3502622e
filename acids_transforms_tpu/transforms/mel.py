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

    _leaves = ("window", "mel_bank", "dct_mat", "norm")

    def __init__(
        self,
        n_fft: int = 1024,
        hop_length: int = 256,
        power: float = 2.0,
        n_mels: int = 128,
        sr: int = 44100,
        norm_mode: Optional[str] = None,
        n_mfcc: Optional[int] = None,
        impl: str = "auto",
    ):
        super().__init__(sr=sr)
        self.n_fft = int(n_fft)
        self.hop_length = int(hop_length)
        self.power = float(power)
        self.n_mels = int(n_mels)
        self.n_mfcc = int(n_mfcc) if n_mfcc else None
        self.impl = impl
        self.norm = Normalize(mode=norm_mode) if norm_mode is not None else None
        self.window = hann_window(self.n_fft)
        self.mel_bank = jnp.asarray(mel_banks(self.n_fft, sr, self.n_mels))
        # optional real cepstral stage (DCT-II, ortho) — the reference's
        # "MFCC" has no DCT (a misnomer, reference mel.py:31-44); passing
        # n_mfcc enables true MFCCs as an extension.
        if self.n_mfcc:
            import numpy as _np

            k = _np.arange(self.n_mels)[:, None]
            c = _np.arange(self.n_mfcc)[None, :]
            d = _np.cos(_np.pi * (k + 0.5) * c / self.n_mels) * _np.sqrt(2.0 / self.n_mels)
            d[:, 0] *= 1.0 / _np.sqrt(2.0)
            self.dct_mat = jnp.asarray(d.astype(_np.float32))
        else:
            self.dct_mat = None

    @property
    def needs_scaling(self) -> bool:
        return self.norm is not None

    @property
    def ratio(self) -> int:
        return self.hop_length

    def output_frame_axis(self, axis_in=None):
        return -1  # torchaudio bin-major layout (..., n_mels, frames)

    def _melspec(self, x: jnp.ndarray) -> jnp.ndarray:
        spec = stft_op(x, self.n_fft, self.hop_length, self.window, impl=self.impl)
        p = jnp.abs(spec) ** self.power  # (..., T, F)
        mel = jnp.matmul(p, self.mel_bank, precision=matmul_precision())
        if self.dct_mat is not None:
            mel = jnp.matmul(
                jnp.log(jnp.maximum(mel, 1e-6)), self.dct_mat,
                precision=matmul_precision(),
            )
        return jnp.swapaxes(mel, -2, -1)  # (..., n_mels, T) — torchaudio layout

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        y = self._melspec(x)
        if self.norm is not None:
            y = self.norm.forward(y)
        return y

    def fit(self, x: jnp.ndarray, mask=None) -> "MFCC":
        if self.norm is None:
            return self
        # reference fits the norm on the *raw input* handed to scale_data
        # (mel.py:60-63) — kept for parity.
        return self.replace(norm=self.norm.fit(x, mask=mask))

    def propagate_mask(self, mask, x):
        if mask is None:
            return None
        T = x.shape[-1] // self.hop_length + 1
        starts = jnp.clip(jnp.arange(T) * self.hop_length, 0, mask.shape[-1] - 1)
        return jnp.take(mask, starts, axis=-1)[..., None, :]  # (..., 1, frames)

    def forward_with_time(self, x, time):
        y = self.forward(x)
        n_chunks = y.shape[-1]  # frame axis is -1 in the mel layout
        # (the reference derives chunk count from axis -2 = n_mels, a bug —
        # mel.py:48-57; corrected here.)
        shifts = jnp.arange(n_chunks) * (self.hop_length / self.sr)
        return y, shifts + time[..., None]

    def invert(self, x, inversion_mode=None, key=None):
        raise NotInvertibleError
