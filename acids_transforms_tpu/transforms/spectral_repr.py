"""Real-valued spectral representations over complex STFT/DGT frames.

Reference: acids_transforms/transforms/spectral_repr.py.  All transforms here
consume the complex ``(..., frames, bins)`` layout, produce real tensors, and
invert by undoing normalization (+ mel pseudo-inverse / phase integration).

TPU notes: the mel projection and its pseudo-inverse are single GEMMs against
precomputed square filterbanks (MXU path, fused by XLA with the surrounding
``abs``/``log1p``/affine-norm elementwise work); the IF integration is
``cumsum``-based (ops/phase.py) instead of the reference's Python loops.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp

from ..ops.fft import matmul_precision
from ..ops.mel import square_mel_banks
from ..ops.phase import (
    expi,
    fdiff_backward,
    fdiff_central,
    fdiff_forward,
    fint_backward,
    fint_central,
    fint_forward,
    unwrap,
)
from .base import AudioTransform
from .norm import Normalize

__all__ = [
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
]


class Dummy(AudioTransform):
    """Identity stand-in used when ``mode=None`` (reference spectral_repr.py:17-18)."""


class _Representation(AudioTransform):
    """Shared base: owns a :class:`Normalize` (or :class:`Dummy`), handles the
    ``keep_nyquist`` bin-drop/re-pad (reference spectral_repr.py:21-75)."""

    scriptable = True
    invertible = True
    needs_scaling = True

    _leaves = ("norm",)

    def __init__(
        self,
        sr: int = 44100,
        mode: Optional[str] = None,
        keep_nyquist: bool = True,
    ):
        super().__init__(sr=sr)
        if mode is None or mode == "none":
            self.norm: AudioTransform = Dummy()
        else:
            self.norm = Normalize(mode)
        self.keep_nyquist = bool(keep_nyquist)

    # subclasses define the real-valued extraction used by forward/fit
    def _extract(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def _drop_nyquist(self, x: jnp.ndarray) -> jnp.ndarray:
        return x if self.keep_nyquist else x[..., 1:]

    def _pad_nyquist(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.keep_nyquist:
            return x
        pad = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
        return jnp.concatenate([x, pad], axis=-1)

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._drop_nyquist(self.norm.forward(self._extract(x)))

    def fit(self, x: jnp.ndarray, mask=None) -> "_Representation":
        return self.replace(norm=self.norm.fit(self._extract(x), mask=mask))

    def invert(self, x, inversion_mode=None, key=None):
        return self._pad_nyquist(self.norm.invert(x))

    # ------------------------------------------------------------- test hooks
    def _test_spectrum(self, x: jnp.ndarray) -> jnp.ndarray:
        """Representations consume complex spectra: run an STFT first
        (reference spectral_repr.py:66-75)."""
        from .stft import STFT

        return STFT().forward(x)

    def test_forward(self, x: jnp.ndarray, time=None):
        spec = self._test_spectrum(x)
        self.scale_data(spec)
        out = self.forward(spec)
        return out if time is None else (out, time)

    def test_inversion(self, x: jnp.ndarray):
        spec = self._test_spectrum(x)
        self.scale_data(spec)
        y = self.forward(spec)
        return {"inverted": self.invert(y)}


class Real(_Representation):
    """Real part + norm (reference spectral_repr.py:78-104)."""

    def _extract(self, x):
        return jnp.real(x)

    def forward(self, x):
        # nyquist dropped on the complex input (reference spectral_repr.py:84-87)
        x = self._drop_nyquist(x)
        return self.norm.forward(jnp.real(x))

    def invert(self, x, inversion_mode=None, key=None):
        return self._pad_nyquist(self.norm.invert(x))


class Imaginary(_Representation):
    """Imaginary part + norm; zeros for real input (reference spectral_repr.py:107-137)."""

    def _extract(self, x):
        return jnp.imag(x)

    def forward(self, x):
        if jnp.iscomplexobj(x):
            y = self.norm.forward(jnp.imag(x))
        else:
            y = jnp.zeros_like(x)
        return self._drop_nyquist(y)


class Magnitude(_Representation):
    """|X| -> optional square-mel GEMM -> contrast -> norm
    (reference spectral_repr.py:143-258).

    The mel pair is the reference construction (spectral_repr.py:170-189):
    column-normalized forward bank, row-normalized transposed pseudo-inverse,
    ``n_mels = n_bins``.  Contrast modes: ``log1p`` (default) / ``log`` /
    ``log10`` / ``none`` with exact inverses.
    """

    _leaves = ("norm", "mel_bank", "inverse_mel_bank")

    def __init__(
        self,
        sr: int = 44100,
        mode: Optional[str] = "unipolar",
        contrast: Optional[str] = "log1p",
        mel: bool = True,
        n_fft: int = 1024,
        eps: Optional[float] = None,
        keep_nyquist: bool = True,
        mel_inverse: str = "transpose",
        norm: Optional[str] = None,
    ):
        # `norm=` alias: the reference README's usage example spells the
        # normalizer kwarg `norm="unipolar"` (reference README.md:53)
        # while its code takes `mode=` (spectral_repr.py:153) — the
        # example fails on the reference itself.  Accept the README
        # spelling so copied examples just work (overrides `mode`).
        if norm is not None:
            mode = norm
        super().__init__(sr=sr, mode=mode, keep_nyquist=keep_nyquist)
        if contrast not in ("log1p", "log", "log10", "none", None):
            raise TypeError("unknown contrast type %s" % contrast)
        self.contrast_mode = contrast
        self.mel = bool(mel)
        self.n_fft = int(n_fft)
        self.eps = float(eps if eps is not None else jnp.finfo(jnp.float32).eps)
        # mel_inverse="pinv" swaps the reference's row-normalized-transpose
        # pseudo-inverse for a regularized least-squares inverse (much more
        # accurate magnitude reconstruction; ops/mel.py:square_mel_banks)
        self.mel_inverse = mel_inverse
        fwd, inv = square_mel_banks(
            self.n_fft, sr, keep_nyquist=self.keep_nyquist, inverse=mel_inverse
        )
        self.mel_bank = jnp.asarray(fwd)
        self.inverse_mel_bank = jnp.asarray(inv)

    # ------------------------------------------------------------- contrast
    def contrast(self, mag: jnp.ndarray) -> jnp.ndarray:
        if self.contrast_mode == "log1p":
            return jnp.log1p(mag)
        if self.contrast_mode == "log":
            return jnp.log(jnp.maximum(mag, self.eps))
        if self.contrast_mode == "log10":
            return jnp.log10(jnp.maximum(mag, self.eps))
        return mag

    def invert_contrast(self, mag: jnp.ndarray) -> jnp.ndarray:
        if self.contrast_mode == "log1p":
            return jnp.expm1(mag)
        if self.contrast_mode == "log":
            return jnp.exp(mag) - self.eps
        if self.contrast_mode == "log10":
            return jnp.power(10.0, mag)
        return mag

    # ---------------------------------------------------------------- api
    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        mag = jnp.abs(x)
        if self.mel:
            mag = jnp.matmul(mag, self.mel_bank, precision=matmul_precision())
        mag = self.contrast(mag)
        mag = self.norm.forward(mag)
        return self._drop_nyquist(mag)

    def invert(self, x, inversion_mode=None, key=None):
        mag = self.norm.invert(x)
        mag = self._pad_nyquist(mag)
        mag = self.invert_contrast(mag)
        if self.mel:
            mag = jnp.matmul(mag, self.inverse_mel_bank, precision=matmul_precision())
        return mag

    def fit(self, x: jnp.ndarray, mask=None) -> "Magnitude":
        # the reference fits the norm on the *non-mel* contrasted magnitude
        # (spectral_repr.py:242-245) — kept for behavioural parity.
        stats_in = self.contrast(jnp.abs(x))
        return self.replace(norm=self.norm.fit(stats_in, mask=mask))


class Phase(_Representation):
    """``angle(X)`` + optional unwrap + norm (reference spectral_repr.py:261-298)."""

    def __init__(
        self,
        sr: int = 44100,
        mode: Optional[str] = None,
        keep_nyquist: bool = True,
        unwrap: bool = False,
    ):
        super().__init__(sr=sr, mode=mode, keep_nyquist=keep_nyquist)
        self.unwrap = bool(unwrap)

    def _extract(self, x):
        p = jnp.angle(x)
        if self.unwrap:
            p = unwrap(p)
        return p


IF_METHODS = ("backward", "forward", "central")


class IF(_Representation):
    """Instantaneous frequency: unwrap + frame-axis finite difference, with
    cumulative-sum inversion (reference spectral_repr.py:302-392).

    Inversion exactness: ``backward`` and ``forward`` integrate exactly;
    ``central`` is exact for even frame counts only — for odd frame counts the
    odd-parity rows have no anchor in the differenced data and inherit a
    seeded-offset approximation (see ops/phase.py:fint_central).

    ``method`` selects the stencil (``backward``/``forward``/``central``,
    scaled by -pi / pi / 2*pi on the interior rows, reference
    spectral_repr.py:322-329); ``weighted`` applies the parabolic frame window
    (reference spectral_repr.py:337-345) — and unlike the reference, the
    inversion divides it back out so weighted IF still round-trips.
    """

    def __init__(
        self,
        sr: int = 44100,
        mode: Optional[str] = "gaussian",
        method: str = "forward",
        weighted: bool = False,
        keep_nyquist: bool = True,
    ):
        super().__init__(sr=sr, mode=mode, keep_nyquist=keep_nyquist)
        if method not in IF_METHODS:
            raise AttributeError("method %s not known" % method)
        self.method = method
        self.weighted = bool(weighted)

    def get_if_methods(self):
        return list(IF_METHODS)

    def _weight_window(self, n_frames: int) -> jnp.ndarray:
        n = jnp.arange(n_frames)
        w = (1.5 * n_frames) / (n_frames ** 2 - 1) * (
            1.0 - ((n - (n_frames / 2 - 1)) / (n_frames / 2)) ** 2
        )
        return w[:, None]

    def get_if(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.get_if_from_phase(jnp.angle(x))

    def get_if_from_phase(self, p: jnp.ndarray) -> jnp.ndarray:
        """IF over an already-extracted (wrapped) phase — the entry the
        fused forward uses (fuse.py) so both paths share one code path."""
        p = unwrap(p)
        if self.method == "backward":
            d = fdiff_backward(p)
            d = d.at[..., 1:, :].divide(-jnp.pi)
        elif self.method == "forward":
            d = fdiff_forward(p)
            d = d.at[..., :-1, :].divide(jnp.pi)
        else:  # central
            d = fdiff_central(p)
            d = d.at[..., 1:-1, :].divide(2.0 * jnp.pi)
        if self.weighted:
            d = d * self._weight_window(d.shape[-2])
        return d

    def _extract(self, x):
        return self.get_if(x)

    def invert(self, x, inversion_mode=None, key=None):
        d = self.norm.invert(x)
        if self.weighted:
            # the parabolic window is exactly 0 at the final frame — that row
            # is unrecoverable; divide only where the weight is nonzero
            w = self._weight_window(d.shape[-2])
            d = jnp.where(jnp.abs(w) > 1e-12, d / jnp.where(w == 0, 1.0, w), d)
        if self.method == "backward":
            d = d.at[..., 1:, :].multiply(-jnp.pi)
            p = fint_backward(d)
        elif self.method == "forward":
            d = d.at[..., :-1, :].multiply(jnp.pi)
            p = fint_forward(d)
        else:
            d = d.at[..., 1:-1, :].multiply(2.0 * jnp.pi)
            p = fint_central(d)
        return self._pad_nyquist(p)


SpectralRepresentationType = Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]


class SpectralRepresentation(AudioTransform):
    """Magnitude+phase pair combiner (reference spectral_repr.py:399-483).

    Holds two sub-representations; ``forward`` stacks them on ``stack``
    (default -2) or returns a tuple when ``stack=None``; ``invert`` splits and
    recombines ``mag * exp(j * phase)``.
    """

    scriptable = True
    invertible = True
    needs_scaling = True

    _leaves = ("magnitude", "phase")

    def __init__(
        self,
        sr: int = 44100,
        magnitude_transform=None,
        phase_transform=None,
        magnitude_args: Optional[dict] = None,
        phase_args: Optional[dict] = None,
        stack: Optional[int] = -2,
        keep_nyquist: bool = True,
    ):
        super().__init__(sr=sr)
        if type(self) is SpectralRepresentation:
            raise RuntimeError("SpectralRepresentation should not be called directly.")
        self.keep_nyquist = bool(keep_nyquist)
        self.stack = stack
        self.magnitude = magnitude_transform(
            sr=sr, keep_nyquist=keep_nyquist, **(magnitude_args or {})
        )
        self.phase = phase_transform(
            sr=sr, keep_nyquist=keep_nyquist, **(phase_args or {})
        )

    def fit(self, x: jnp.ndarray, mask=None) -> "SpectralRepresentation":
        return self.replace(
            magnitude=self.magnitude.fit(x, mask=mask),
            phase=self.phase.fit(x, mask=mask),
        )

    def forward(self, x: jnp.ndarray) -> SpectralRepresentationType:
        m = self.magnitude.forward(x)
        p = self.phase.forward(x)
        if self.stack is not None:
            return jnp.stack([m, p], axis=self.stack)
        return (m, p)

    def output_frame_axis(self, axis_in=None):
        if axis_in is None:
            return None
        if self.stack is None:
            return axis_in  # tuple output: both halves keep the input layout
        if self.stack >= 0:
            return None  # front-counted stack dim: not representable
        return axis_in - 1 if self.stack >= axis_in else axis_in

    def _split(self, x):
        if self.stack is None:
            return x[0], x[1]
        m = jnp.take(x, 0, axis=self.stack)
        p = jnp.take(x, 1, axis=self.stack)
        return m, p

    def invert(self, x, inversion_mode=None, key=None):
        m, p = self._split(x)
        m = self.magnitude.invert(m)
        p = self.phase.invert(p)
        return m * expi(p)

    # ------------------------------------------------------------- test hooks
    def test_forward(self, x: jnp.ndarray, time=None):
        from .stft import STFT

        spec = STFT().forward(x)
        self.scale_data(spec)
        out = self.forward(spec)
        return out if time is None else (out, time)

    def test_inversion(self, x: jnp.ndarray):
        from .stft import STFT

        stft_t = STFT()
        spec = stft_t.forward(x)
        self.scale_data(spec)
        spec_rec = self.invert(self.forward(spec))
        return {"inverted": stft_t.invert(spec_rec)}


class Cartesian(SpectralRepresentation):
    """Real + Imaginary pair (reference spectral_repr.py:486-508)."""

    def __init__(
        self,
        sr: int = 44100,
        real_args: Optional[dict] = None,
        imag_args: Optional[dict] = None,
        stack: Optional[int] = -2,
        keep_nyquist: bool = True,
    ):
        super().__init__(
            sr,
            Real,
            Imaginary,
            real_args if real_args is not None else {"mode": "gaussian"},
            imag_args if imag_args is not None else {"mode": "gaussian"},
            stack=stack,
            keep_nyquist=keep_nyquist,
        )

    def invert(self, x, inversion_mode=None, key=None):
        re, im = self._split(x)
        re = self.magnitude.invert(re)
        im = self.phase.invert(im)
        return re + 1j * im


class Polar(SpectralRepresentation):
    """Magnitude + Phase pair (reference spectral_repr.py:511-522)."""

    def __init__(
        self,
        sr: int = 44100,
        magnitude_args: Optional[dict] = None,
        phase_args: Optional[dict] = None,
        stack: Optional[int] = -2,
        keep_nyquist: bool = True,
    ):
        super().__init__(
            sr,
            Magnitude,
            Phase,
            magnitude_args if magnitude_args is not None else {"mode": "bipolar"},
            phase_args if phase_args is not None else {"mode": "bipolar"},
            stack=stack,
            keep_nyquist=keep_nyquist,
        )


class PolarIF(SpectralRepresentation):
    """Magnitude + Instantaneous Frequency pair (reference spectral_repr.py:525-552)."""

    def __init__(
        self,
        sr: int = 44100,
        magnitude_args: Optional[dict] = None,
        phase_args: Optional[dict] = None,
        stack: Optional[int] = -2,
        keep_nyquist: bool = True,
    ):
        super().__init__(
            sr,
            Magnitude,
            IF,
            magnitude_args if magnitude_args is not None else {"mode": "bipolar"},
            phase_args if phase_args is not None else {"mode": "bipolar"},
            stack=stack,
            keep_nyquist=keep_nyquist,
        )
