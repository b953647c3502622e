"""Discrete Gabor Transform with PGHI phaseless inversion.

Reference: acids_transforms/transforms/dgt.py.  The DGT is an STFT with a
truncated Gaussian analysis window (reference dgt.py:108-112) whose
time-frequency ratio ``gamma = 2*pi*lambda^2`` makes the phase-magnitude
Cauchy-Riemann relations exact — the basis of PGHI phase reconstruction.

TPU-native deltas (all covered in tests/test_dgt.py):

* offline complex inversion uses the least-squares ISTFT with the *analysis*
  window, which is exact.  (The reference feeds its canonical dual window to
  ``torch.istft`` (dgt.py:92), whose internal envelope normalization then
  divides by ``sum d^2`` instead of ``sum w d`` — a systematic gain error of
  the squared-window envelope, ~1.18x for hop = n_fft/4.)
* ``pghi`` runs the peak-anchored scan integration (ops/pghi.py) — batched,
  jittable, heap-free; ``pghi_exact`` exposes the magnitude-ordered heap
  (native C++ / numpy host oracle); streaming uses the same scan causally.
* ``gamma`` is ``2*pi*lambda^2`` in both offline and realtime (the reference
  realtime uses ``lambda``, dgt.py:373-376, and swaps the two gradient fields
  in its heap — dgt.py:437-457; both corrected here).
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.pghi import pghi_heap_numpy
from ..ops.windows import dgt_gamma, dual_window, gaussian_dgt_window
from .stft import STFT, RealtimeSTFT

__all__ = ["DGT", "RealtimeDGT"]


class DGT(STFT):
    """Offline DGT (reference dgt.py:24-236).

    Inversion modes: ``pghi`` (default; peak-anchored scan integration,
    ops/pghi.py), ``pghi_exact`` (exact heap on host — native C++ or numpy),
    ``griffin_lim``, ``random``, ``keep_input``, ``sinebank``.
    """

    def __init__(
        self,
        sr: int = 44100,
        n_fft: int = 1024,
        hop_length: int = 256,
        inversion_mode: str = "pghi",
        tolerance: float = 1e-2,
        impl: str = "auto",
        seed: int = 0,
    ):
        super().__init__(
            sr=sr,
            n_fft=n_fft,
            hop_length=hop_length,
            inversion_mode=inversion_mode,
            window="hann",  # placeholder; _get_window overrides
            impl=impl,
            seed=seed,
            tolerance=tolerance,
        )

    def _get_window(self) -> jnp.ndarray:
        return gaussian_dgt_window(self.n_fft)

    @property
    def gamma(self) -> float:
        return dgt_gamma(self.n_fft)

    @property
    def dual(self) -> jnp.ndarray:
        """Canonical dual synthesis window (used by the streaming variant)."""
        return dual_window(np.asarray(self.window), self.hop_length)

    @staticmethod
    def get_inversion_modes() -> List[str]:
        return [
            "pghi",
            "pghi_bidir",
            "griffin_lim",
            "random",
            "keep_input",
            "sinebank",
            "pghi_exact",
            "pghi_gl",
        ]

    # invert_without_phase / pghi / pghi_exact / pghi_gl are inherited from
    # STFT (they dispatch on ``self.gamma``, which this class overrides with
    # the exact Gaussian value)

    def realtime(self) -> "RealtimeDGT":
        mode = (
            self.inversion_mode
            if self.inversion_mode in RealtimeDGT.get_inversion_modes()
            else "pghi"
        )
        return RealtimeDGT(
            sr=self.sr,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            inversion_mode=mode,
            tolerance=self.tolerance,
            impl=self.impl,
        )


def _heap_backend(mag2d, gamma, n_fft, hop, tol):
    """Dispatch one (T, F) spectrogram to the native heap PGHI if built,
    else the numpy oracle."""
    from ..native import pghi_native

    if pghi_native.available():
        return pghi_native.pghi(mag2d, gamma, n_fft, hop, tol)
    return pghi_heap_numpy(mag2d, gamma, n_fft, hop, tol)


class RealtimeDGT(RealtimeSTFT):
    """Streaming DGT with causal RT-PGHI (reference dgt.py:239-519).

    All streaming machinery (state pytree with the 2-frame magnitude +
    1-frame phase history, scan-based causal PGHI, stateful sinebank) lives
    in :class:`RealtimeSTFT`; this class supplies the Gaussian analysis
    window, its exact ``gamma`` and the scaled canonical dual synthesis
    window.  The reference implements this as a separate ~280-line class
    with Python batch loops (dgt.py:338-353) and swapped gradient fields
    (dgt.py:437-457) — both superseded by the shared vectorized scan.
    """

    def __init__(
        self,
        sr: int = 44100,
        n_fft: int = 1024,
        hop_length: int = 256,
        inversion_mode: str = "pghi",
        tolerance: float = 1e-2,
        batch_size: int = 2,
        impl: str = "auto",
        seed: int = 0,
        gl_iterations: int = 16,
        gl_context: Optional[int] = None,
        lookahead_frames: int = 0,
    ):
        super().__init__(
            sr=sr,
            n_fft=n_fft,
            hop_length=hop_length,
            inversion_mode=inversion_mode,
            window="hann",  # placeholder; _get_window overrides
            impl=impl,
            seed=seed,
            batch_size=batch_size,
            gl_iterations=gl_iterations,
            gl_context=gl_context,
            lookahead_frames=lookahead_frames,
        )
        self.tolerance = float(tolerance)

    def _get_window(self) -> jnp.ndarray:
        return gaussian_dgt_window(self.n_fft)

    @property
    def gamma(self) -> float:
        return dgt_gamma(self.n_fft)

    @property
    def dual(self) -> jnp.ndarray:
        return dual_window(np.asarray(self.window), self.hop_length)

    @staticmethod
    def get_inversion_modes() -> List[str]:
        return ["random", "pghi", "keep_input", "sinebank", "pghi_exact", "pghi_gl"]
