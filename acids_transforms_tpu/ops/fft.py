"""STFT / ISTFT engine with torch-parity numerics and an MXU (DFT-as-GEMM) path.

Conventions match ``torch.stft`` / ``torch.istft`` as used by the reference
(acids_transforms/transforms/stft.py:97-128): ``center=True`` with reflect
padding, ``onesided=True``, ``normalized=False``, analysis window length
``n_fft``; ISTFT performs the least-squares inversion (synthesis window applied
to IFFT frames, overlap-add, division by the squared-window envelope, centre
trim to ``hop * (T - 1)`` samples).

Two spectral backends:

* ``impl="fft"``     — XLA's native FFT.
* ``impl="matmul"``  — the DFT as two real GEMMs against precomputed
  cos/sin matrices.  On TPU the MXU's matmul throughput makes this the faster
  path for small/medium ``n_fft`` despite the O(N^2) FLOPs, and it fuses with
  the surrounding window/mel/log elementwise work into one GEMM epilogue.
* ``impl="auto"``    — matmul for ``n_fft <= 4096``, else FFT.

Frame-major layout ``(..., frames, bins)`` everywhere (the reference
transposes torch's bin-major output to this same layout, stft.py:102).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .framing import frame, overlap_add

__all__ = [
    "stft",
    "istft",
    "rfft_frames",
    "irfft_frames",
    "spectral_frames",
    "MATMUL_MAX_NFFT",
]

MATMUL_MAX_NFFT = 4096

# bf16x3 ("HIGH") keeps the DFT GEMMs at ~1e-5 relative error — an order of
# magnitude inside the 1e-4 parity budget — at ~1.5x the throughput of the
# 6-pass HIGHEST mode on v5e (measured; see bench.py history).
_PRECISION = jax.lax.Precision.HIGH


def set_matmul_precision(precision) -> None:
    """Set the MXU precision for the DFT/mel GEMM paths
    (``jax.lax.Precision`` or one of "default"/"high"/"highest")."""
    global _PRECISION
    if isinstance(precision, str):
        precision = {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[precision]
    _PRECISION = precision


def matmul_precision():
    return _PRECISION


@functools.lru_cache(maxsize=None)
def _dft_matrices(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Forward real-DFT basis: cos/sin matrices of shape (n_fft, n_bins)."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return (
        np.cos(ang).astype(np.float32),
        (-np.sin(ang)).astype(np.float32),
    )


@functools.lru_cache(maxsize=None)
def _idft_matrices(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse real-DFT basis: (n_bins, n_fft) matrices A, B with
    ``x = Re @ A + Im @ B`` reproducing ``irfft`` (hermitian weights folded in)."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    w = np.full((n_bins, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    A = (w * np.cos(ang) / n_fft).astype(np.float32)
    B = (-w * np.sin(ang) / n_fft).astype(np.float32)
    return A, B


def _resolve_impl(impl: str, n_fft: int) -> str:
    if impl == "auto":
        # direct GEMM wins on TPU: measured 15.9M frames/s vs 8.0M for the
        # radix-2 split (the even/odd lane deinterleave + twiddle gathers
        # cost more than the halved MXU FLOPs) and 4.3M for XLA's FFT
        # (BENCH_NOTES.md) — MXU FLOPs are cheaper than data reshuffles.
        return "matmul" if n_fft <= MATMUL_MAX_NFFT else "fft"
    if impl not in ("fft", "matmul", "matmul2"):
        raise ValueError("unknown fft impl %r" % impl)
    return impl


@functools.lru_cache(maxsize=None)
def _radix2_tables(n_fft: int):
    """Static tables for the radix-2 decimation-in-time rDFT.

    ``X[k] = E[k] + W_N^k O[k]`` with E, O the half-size DFTs of the even/odd
    samples.  E/O at bins 0..N/2 are recovered from their half-size rDFTs
    (period M = N/2 plus conjugate symmetry) by a static gather + sign map.
    """
    M = n_fft // 2
    F = n_fft // 2 + 1
    k = np.arange(F)
    km = k % M
    idx = np.minimum(km, M - km)  # index into the (M/2+1)-bin half rDFT
    conj = (km > M // 2).astype(np.float32)  # reflected bins are conjugated
    sign_im = (1.0 - 2.0 * conj).astype(np.float32)
    tw_re = np.cos(2.0 * np.pi * k / n_fft).astype(np.float32)
    tw_im = (-np.sin(2.0 * np.pi * k / n_fft)).astype(np.float32)
    return idx.astype(np.int32), sign_im, tw_re, tw_im


def rfft_frames(frames_w: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """rFFT of windowed frames ``(..., T, n_fft) -> (..., T, n_fft//2+1)`` complex."""
    n_fft = frames_w.shape[-1]
    impl = _resolve_impl(impl, n_fft)
    if impl == "fft":
        return jnp.fft.rfft(frames_w, axis=-1)
    prec = _PRECISION
    if impl == "matmul2":
        # radix-2 DIT: two half-size rDFT GEMMs (half the MXU FLOPs of the
        # direct DFT) + a static-gather twiddle combine on the VPU
        M = n_fft // 2
        even = frames_w[..., 0::2]
        odd = frames_w[..., 1::2]
        Ch, Sh = _dft_matrices(M)
        eo = jnp.concatenate([even, odd], axis=-2)  # one big GEMM batch
        re_h = jnp.matmul(eo, jnp.asarray(Ch), precision=prec)
        im_h = jnp.matmul(eo, jnp.asarray(Sh), precision=prec)
        T = frames_w.shape[-2]
        Er, Or_ = re_h[..., :T, :], re_h[..., T:, :]
        Ei, Oi = im_h[..., :T, :], im_h[..., T:, :]

        idx, sign_im, tw_re, tw_im = _radix2_tables(n_fft)
        idx = jnp.asarray(idx)
        sign_im = jnp.asarray(sign_im)
        tw_re_j, tw_im_j = jnp.asarray(tw_re), jnp.asarray(tw_im)

        def expand(r, i):
            r_full = jnp.take(r, idx, axis=-1)
            i_full = jnp.take(i, idx, axis=-1) * sign_im
            return r_full, i_full

        Er_f, Ei_f = expand(Er, Ei)
        Or_f, Oi_f = expand(Or_, Oi)
        re = Er_f + tw_re_j * Or_f - tw_im_j * Oi_f
        im = Ei_f + tw_re_j * Oi_f + tw_im_j * Or_f
        return jax.lax.complex(re, im)
    C, S = _dft_matrices(n_fft)
    re = jnp.matmul(frames_w, jnp.asarray(C), precision=prec)
    im = jnp.matmul(frames_w, jnp.asarray(S), precision=prec)
    return jax.lax.complex(re, im)


def irfft_frames(spec: jnp.ndarray, n_fft: Optional[int] = None, impl: str = "auto") -> jnp.ndarray:
    """Inverse rFFT of frames ``(..., T, n_bins) -> (..., T, n_fft)``."""
    n_bins = spec.shape[-1]
    if n_fft is None:
        n_fft = 2 * (n_bins - 1)
    impl = _resolve_impl(impl, n_fft)
    if impl == "fft":
        return jnp.fft.irfft(spec, n=n_fft, axis=-1)
    A, B = _idft_matrices(n_fft)
    re = jnp.real(spec)
    im = jnp.imag(spec)
    return (
        jnp.matmul(re, jnp.asarray(A), precision=_PRECISION)
        + jnp.matmul(im, jnp.asarray(B), precision=_PRECISION)
    )


def spectral_frames(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Centre-pad and slice ``x (..., L)`` into windowed frames ``(..., T, n_fft)``."""
    if center:
        pads = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pads, mode=pad_mode)
    frames = frame(x, n_fft, hop_length, axis=-1)
    return frames * window


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    center: bool = True,
    pad_mode: str = "reflect",
    impl: str = "auto",
) -> jnp.ndarray:
    """Short-time Fourier transform, torch conventions, frame-major output.

    ``x (..., L) -> complex (..., T, n_fft//2+1)`` with ``T = 1 + L // hop``
    when ``center=True``.
    """
    frames_w = spectral_frames(x, n_fft, hop_length, window, center, pad_mode)
    return rfft_frames(frames_w, impl=impl)


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    center: bool = True,
    length: Optional[int] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Least-squares ISTFT matching ``torch.istft`` (frame-major input).

    ``spec (..., T, n_bins) -> (..., hop * (T - 1))`` when ``center=True`` and
    ``length`` is None.
    """
    T = spec.shape[-2]
    y_frames = irfft_frames(spec, n_fft=n_fft, impl=impl) * window
    y = overlap_add(y_frames, hop_length)

    env_frames = jnp.broadcast_to(window[None, :] ** 2, (T, n_fft))
    env = overlap_add(env_frames, hop_length)
    tiny = jnp.finfo(y.dtype).tiny
    y = y / jnp.where(env > tiny, env, jnp.ones_like(env))

    if center:
        start = n_fft // 2
        if length is None:
            stop = y.shape[-1] - (n_fft - n_fft // 2)
        else:
            stop = start + length
        y = y[..., start:stop]
        if length is not None and y.shape[-1] < length:
            pads = [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])]
            y = jnp.pad(y, pads)
    elif length is not None:
        y = y[..., :length]
    return y
