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

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fft import irfft_frames, rfft_frames
from ..ops.pghi import pghi_heap_numpy, pghi_scan
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


class RealtimeDGT(DGT):
    """Streaming DGT with causal (RT-)PGHI (reference dgt.py:239-519).

    Carries 2 magnitude frames + 1 phase frame across chunk boundaries
    (reference dgt.py:247-250) in an explicit state pytree; the per-chunk
    phase reconstruction is one ``lax.scan`` over frames, vectorized over
    bins and batch.
    """

    _volatile = ("_phase_buffer", "_state")

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
    ):
        super().__init__(
            sr=sr,
            n_fft=n_fft,
            hop_length=hop_length,
            inversion_mode=inversion_mode,
            tolerance=tolerance,
            impl=impl,
            seed=seed,
        )
        self.batch_size = int(batch_size)
        self._state = None

    def _get_inv_window(self) -> jnp.ndarray:
        overlap = max(self.n_fft // self.hop_length, 1)
        return float(overlap) * dual_window(
            np.asarray(gaussian_dgt_window(self.n_fft)), self.hop_length
        )

    @staticmethod
    def get_inversion_modes() -> List[str]:
        return ["random", "pghi", "keep_input", "sinebank", "pghi_exact"]

    # ------------------------------------------------------------- streaming
    def init_state(
        self, batch_shape: Tuple[int, ...] = (), key: Optional[jax.Array] = None
    ) -> Dict[str, jnp.ndarray]:
        key = self._take_key(key)
        return {
            "mag_buffer": jnp.zeros(tuple(batch_shape) + (2, self.n_bins)),
            "phase_buffer": jnp.zeros(tuple(batch_shape) + (self.n_bins,)),
            "time_index": jnp.zeros(()),
            "random_phase": 2.0
            * jnp.pi
            * jax.random.uniform(key, tuple(batch_shape) + (1, self.n_bins)),
        }

    def reset(self, batch_shape: Tuple[int, ...] = ()) -> None:
        self._state = self.init_state(tuple(batch_shape))

    def get_batch_size(self) -> int:
        return self.batch_size

    def set_batch_size(self, batch_size: int) -> None:
        self.batch_size = int(batch_size)

    # --------------------------------------------------------------- forward
    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        spec = rfft_frames(x * self.window, impl=self.impl)
        self._stash_phase(spec)
        return spec

    def forward_with_time(self, x, time):
        return self.forward(x), time

    # ---------------------------------------------------------------- invert
    def invert(
        self,
        x: jnp.ndarray,
        inversion_mode: Optional[str] = None,
        key: Optional[jax.Array] = None,
        phase: Optional[jnp.ndarray] = None,
        tolerance: Optional[float] = None,
    ) -> jnp.ndarray:
        if not jnp.iscomplexobj(x):
            return self.invert_without_phase(
                x, inversion_mode, key=key, phase=phase, tolerance=tolerance
            )
        return irfft_frames(x, n_fft=self.n_fft, impl=self.impl) * self.inv_window

    def invert_without_phase(
        self,
        mag: jnp.ndarray,
        inversion_mode: Optional[str] = None,
        key: Optional[jax.Array] = None,
        phase: Optional[jnp.ndarray] = None,
        tolerance: Optional[float] = None,
    ) -> jnp.ndarray:
        mode = self._resolve_mode(inversion_mode)
        state = self._eager_state(mag)
        if mode in ("pghi", "pghi_exact"):
            new_state, y = self.invert_stream(state, mag, inversion_mode="pghi", key=key)
            self._state = new_state
            return y
        if mode == "sinebank":
            new_state, y = self.sinebank_stream(state, mag)
            self._state = new_state
            return y * self.inv_window
        if mode == "keep_input":
            phase = self._recall_phase(mag) if phase is None else phase
            if phase is None:
                phase = 2.0 * jnp.pi * jax.random.uniform(self._take_key(key), mag.shape)
        elif mode == "random":
            phase = 2.0 * jnp.pi * jax.random.uniform(self._take_key(key), mag.shape)
        else:
            raise ValueError("inversion mode %s not valid." % mode)
        spec = mag * jnp.exp(1j * phase)
        self._state = self._update_buffers(state, spec)
        return self.invert(spec)

    def invert_stream(
        self,
        state: Dict[str, jnp.ndarray],
        x: jnp.ndarray,
        inversion_mode: Optional[str] = None,
        key: Optional[jax.Array] = None,
    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
        """Pure streaming inversion: ``(state, spec_or_mag (..., T, F)) ->
        (state, frames (..., T, n_fft))``."""
        mode = self._resolve_mode(inversion_mode)
        if jnp.iscomplexobj(x):
            return self._update_buffers(state, x), self.invert(x)
        if mode in ("pghi", "pghi_exact"):
            phase = self.pghi_stream(state, x, key=key)
            spec = x * jnp.exp(1j * phase)
            return self._update_buffers(state, spec), self.invert(spec)
        if mode == "sinebank":
            state, y = self.sinebank_stream(state, x)
            return state, y * self.inv_window
        return state, super().invert_without_phase(x, mode, key=key)

    step_invert = invert_stream

    def pghi_stream(
        self,
        state: Dict[str, jnp.ndarray],
        mag: jnp.ndarray,
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Causal PGHI for one chunk of frames, seeded by the carried state."""
        return pghi_scan(
            mag,
            self.gamma,
            self.n_fft,
            self.hop_length,
            tolerance=self.tolerance,
            prev_mag=state["mag_buffer"],
            prev_phase=state["phase_buffer"],
            key=self._take_key(key),
            time_stencil="backward",
        )

    def _update_buffers(
        self, state: Dict[str, jnp.ndarray], spec: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """Carry the trailing 2 magnitude frames + last phase frame
        (reference dgt.py:330-336)."""
        new = dict(state)
        mag = jnp.abs(spec)
        if spec.shape[-2] >= 2:
            new["mag_buffer"] = mag[..., -2:, :]
        else:
            new["mag_buffer"] = jnp.concatenate(
                [state["mag_buffer"][..., 1:, :], mag[..., -1:, :]], axis=-2
            )
        new["phase_buffer"] = jnp.angle(spec[..., -1, :])
        return new

    # sinebank state + streaming test hooks reuse the RealtimeSTFT machinery
    sinebank_stream = RealtimeSTFT.sinebank_stream
    test_forward = RealtimeSTFT.test_forward
    test_inversion = RealtimeSTFT.test_inversion

    def _eager_state(self, mag: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        batch_shape = mag.shape[:-2]
        st = getattr(self, "_state", None)
        if st is None or st["mag_buffer"].shape[:-2] != batch_shape:
            st = self.init_state(batch_shape)
        return st

    def realtime(self) -> "RealtimeDGT":
        return self
