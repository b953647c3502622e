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
    "stft_real",
    "istft",
    "rfft_frames",
    "irfft_frames",
    "spectral_frames",
    "window_taps",
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
    if impl == "factored":
        # already-framed entry points (rfft_frames / irfft_frames) have no
        # chunk structure to exploit — they run the direct GEMM
        return "matmul"
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


# -- cosine-sum window factorization ------------------------------------------
#
# For windows that are short cosine sums (hann = 0.5 - 0.5 cos(2 pi n / N),
# hamming, blackman, ...), the DFT of the window has 2P+1 nonzero bins
# (P = 1 for hann), so the *windowed* frame DFT factors exactly:
#
#   DFT(w . x_t)[k] = sum_p c_p X_t[k - p]            (P-tap spectral conv)
#   X_t[k]          = sum_j e^{-2 pi i k j hop / N} C[t + j, k]   (twiddle)
#   C[c, k]         = sum_{m < hop} x[c hop + m] e^{-2 pi i k m / N}
#
# where C is the DFT of the *non-overlapping* hop chunks against the full-
# resolution basis — a K=hop GEMM computed ONCE per chunk and reused by all
# `overlap` frames covering it.  MXU FLOPs drop by ~overlap x (4x at the
# 1024/256 headline shape) vs the direct windowed-frame GEMM; the twiddle
# combine and the taps conv are cheap fused elementwise work.  This is the
# factorization the radix-2 split could not deliver (BENCH_NOTES.md): the
# data movement here is hop-aligned slices, not lane deinterleaves.


@functools.lru_cache(maxsize=None)
def window_taps(
    window_key, tol: float = 1e-8, max_p: int = 4
) -> Optional[Tuple[float, ...]]:
    """Spectral taps ``(c_0, .., c_P)`` of a cosine-sum window, else None.

    ``window_key`` is a hashable array snapshot (``tuple(np.asarray(w))`` or
    bytes); returns the real symmetric DFT coefficients ``c_p = W[p] / N``
    when the window's DFT is supported on ``|p| <= max_p`` (hann/hamming:
    P=1, blackman: P=2).  Bartlett/kaiser/gaussian windows are not cosine
    sums and return None (callers fall back to the direct GEMM)."""
    w = np.frombuffer(window_key, dtype=np.float64)
    n = w.shape[0]
    W = np.fft.fft(w) / n
    mag = np.abs(W)
    scale = float(mag.max())
    if scale == 0.0:
        return None
    nz = np.where(mag > tol * scale)[0]
    signed = np.where(nz <= n // 2, nz, nz - n)
    P = int(np.abs(signed).max()) if signed.size else 0
    if P > max_p:
        return None
    for p in range(P + 1):
        if abs(W[p].imag) > tol * scale * n:
            return None
        if p and abs(W[p] - W[-p]) > tol * scale * n:
            return None
    return tuple(float(W[p].real) for p in range(P + 1))


def taps_for_window(window) -> Optional[Tuple[float, ...]]:
    """Concrete-window convenience wrapper around :func:`window_taps`."""
    w = np.asarray(window, dtype=np.float64)
    return window_taps(w.tobytes())


@functools.lru_cache(maxsize=None)
def _chunk_dft_matrices(n_fft: int, hop: int) -> Tuple[np.ndarray, np.ndarray]:
    """Full-resolution DFT basis restricted to one hop chunk: (hop, n_bins)."""
    n = np.arange(hop)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _twiddles(n_fft: int, hop: int) -> Tuple[np.ndarray, np.ndarray]:
    """``e^{-2 pi i k j hop / n_fft}`` as (overlap, n_bins) cos/-sin tables."""
    overlap = n_fft // hop
    j = np.arange(overlap)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * k * j * hop / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def _taps_conv(Xre, Xim, taps):
    """Hermitian-aware P-tap convolution along the bin axis:
    ``Y[k] = sum_p c_p X[k-p]`` with ``X[-m] = conj(X[m])`` and
    ``X[N+m] = conj(X[N-m])`` (real signal, N = nyquist index)."""
    Yre = taps[0] * Xre
    Yim = taps[0] * Xim
    for p in range(1, len(taps)):
        c = taps[p]
        # X[k-p]: left edge k < p wraps to conj(X[p-k])
        rp_re = jnp.concatenate(
            [jnp.flip(Xre[..., 1: p + 1], -1), Xre[..., :-p]], -1
        )
        rp_im = jnp.concatenate(
            [-jnp.flip(Xim[..., 1: p + 1], -1), Xim[..., :-p]], -1
        )
        # X[k+p]: right edge k > N-p reflects to conj(X[2N-k-p])
        lp_re = jnp.concatenate(
            [Xre[..., p:], jnp.flip(Xre[..., -p - 1: -1], -1)], -1
        )
        lp_im = jnp.concatenate(
            [Xim[..., p:], -jnp.flip(Xim[..., -p - 1: -1], -1)], -1
        )
        Yre = Yre + c * (rp_re + lp_re)
        Yim = Yim + c * (rp_im + lp_im)
    return Yre, Yim


def _stft_factored(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    taps: Tuple[float, ...],
    center: bool,
    pad_mode: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(re, im) STFT via the chunk-DFT factorization (see module comment)."""
    overlap = n_fft // hop_length
    if center:
        pads = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pads, mode=pad_mode)
    Lp = x.shape[-1]
    T = (Lp - n_fft) // hop_length + 1
    n_rows = T - 1 + overlap
    x = x[..., : n_rows * hop_length]
    chunks = x.reshape(x.shape[:-1] + (n_rows, hop_length))

    Ch, Sh = _chunk_dft_matrices(n_fft, hop_length)
    prec = _PRECISION
    Cre = jnp.matmul(chunks, jnp.asarray(Ch), precision=prec)
    Cim = jnp.matmul(chunks, jnp.asarray(Sh), precision=prec)

    twr_np, twi_np = _twiddles(n_fft, hop_length)
    Xre = None
    for j in range(overlap):
        cr = Cre[..., j: j + T, :]
        ci = Cim[..., j: j + T, :]
        twr = jnp.asarray(twr_np[j])
        twi = jnp.asarray(twi_np[j])
        re_j = twr * cr - twi * ci
        im_j = twr * ci + twi * cr
        Xre = re_j if Xre is None else Xre + re_j
        Xim = im_j if j == 0 else Xim + im_j
    return _taps_conv(Xre, Xim, taps)


def stft_real(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    center: bool = True,
    pad_mode: str = "reflect",
    impl: str = "auto",
    taps: Optional[Tuple[float, ...]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """STFT returning ``(re, im)`` without a complex64 intermediate.

    ``impl="factored"`` (with ``taps``, the static cosine-sum window
    coefficients from :func:`taps_for_window`, and ``hop | n_fft``) runs
    the chunk-DFT factorization — exact to ~5e-7 vs the direct GEMM but
    opt-in only (see the inline note); every other impl takes the
    windowed-frames path.
    """
    if impl == "factored":
        # Opt-in only: measured 1.8x SLOWER than the direct GEMM as an XLA
        # graph (the twiddle/taps elementwise chains are HBM-bound and cost
        # more than the 4x MXU FLOP saving — same lesson as the radix-2
        # split, BENCH_NOTES.md).  The factorization pays off inside the
        # fused Pallas kernel, where those intermediates never leave VMEM
        # (ops/pallas/spectral.py).  Kept as an impl for benchmarking and
        # as the kernel's reference semantics.
        if taps is None:
            raise ValueError(
                "impl='factored' needs cosine-sum window taps "
                "(taps_for_window); this window is not a cosine sum"
            )
        if n_fft % hop_length != 0:
            raise ValueError("impl='factored' requires hop | n_fft")
        return _stft_factored(x, n_fft, hop_length, taps, center, pad_mode)
    frames_w = spectral_frames(x, n_fft, hop_length, window, center, pad_mode)
    spec = rfft_frames(frames_w, impl=impl)
    return jnp.real(spec), jnp.imag(spec)


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    center: bool = True,
    pad_mode: str = "reflect",
    impl: str = "auto",
    taps: Optional[Tuple[float, ...]] = None,
) -> jnp.ndarray:
    """Short-time Fourier transform, torch conventions, frame-major output.

    ``x (..., L) -> complex (..., T, n_fft//2+1)`` with ``T = 1 + L // hop``
    when ``center=True``.  ``taps``: see :func:`stft_real` (used only by
    ``impl="factored"``).
    """
    if impl == "factored":
        re, im = stft_real(
            x, n_fft, hop_length, window, center, pad_mode, impl, taps
        )
        return jax.lax.complex(re, im)
    frames_w = spectral_frames(x, n_fft, hop_length, window, center, pad_mode)
    return rfft_frames(frames_w, impl=impl)


def _istft_factored_frames(
    spec: jnp.ndarray, n_fft: int, hop_length: int, taps: Tuple[float, ...]
) -> jnp.ndarray:
    """``overlap_add(irfft(spec) * w, hop)`` via the chunk factorization.

    The synthesis window multiply is the hermitian taps conv in the spectral
    domain; the OLA target chunk ``c`` collects the ``overlap`` frames
    covering it as conjugate-twiddled accumulations, and ONE K=n_bins GEMM
    against the (n_bins, hop) restricted inverse basis produces the samples —
    ~overlap-fold fewer MXU FLOPs than the (n_bins, n_fft) frame iDFT.
    Returns the un-normalized OLA signal of length ``(T-1) hop + n_fft``.
    """
    overlap = n_fft // hop_length
    T = spec.shape[-2]
    n_bins = spec.shape[-1]
    re, im = jnp.real(spec), jnp.imag(spec)
    re, im = _taps_conv(re, im, taps)

    # hermitian weights / N of the inverse DFT, folded in as a row constant
    wgt = np.full(n_bins, 2.0, np.float32)
    wgt[0] = 1.0
    if n_fft % 2 == 0:
        wgt[-1] = 1.0
    scale = jnp.asarray(wgt / n_fft)
    re = re * scale
    im = im * scale

    twr_np, twi_np = _twiddles(n_fft, hop_length)  # e^{-i...}: conj = (twr, -twi)
    pad_cfg = [(0, 0)] * (re.ndim - 2)
    D_re = None
    for j in range(overlap):
        twc_re = jnp.asarray(twr_np[j])
        twc_im = jnp.asarray(-twi_np[j])
        rj = twc_re * re - twc_im * im
        ij = twc_re * im + twc_im * re
        rj = jnp.pad(rj, pad_cfg + [(j, overlap - 1 - j), (0, 0)])
        ij = jnp.pad(ij, pad_cfg + [(j, overlap - 1 - j), (0, 0)])
        D_re = rj if D_re is None else D_re + rj
        D_im = ij if j == 0 else D_im + ij

    Ch, Sh = _chunk_dft_matrices(n_fft, hop_length)  # (hop, n_bins) cos / -sin
    prec = _PRECISION
    chunks = jnp.matmul(D_re, jnp.asarray(Ch.T), precision=prec) + jnp.matmul(
        D_im, jnp.asarray(Sh.T), precision=prec
    )
    n_rows = T + overlap - 1
    return chunks.reshape(chunks.shape[:-2] + (n_rows * hop_length,))


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    center: bool = True,
    length: Optional[int] = None,
    impl: str = "auto",
    taps: Optional[Tuple[float, ...]] = None,
) -> jnp.ndarray:
    """Least-squares ISTFT matching ``torch.istft`` (frame-major input).

    ``spec (..., T, n_bins) -> (..., hop * (T - 1))`` when ``center=True`` and
    ``length`` is None.  ``taps``: static cosine-sum coefficients of the
    *synthesis* window (see :func:`taps_for_window`) — dispatches the chunk
    factorization when the impl resolves to a GEMM.
    """
    T = spec.shape[-2]
    if impl == "factored":
        if taps is None or n_fft % hop_length != 0:
            raise ValueError(
                "impl='factored' needs cosine-sum taps and hop | n_fft"
            )
        y = _istft_factored_frames(spec, n_fft, hop_length, taps)
    else:
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
