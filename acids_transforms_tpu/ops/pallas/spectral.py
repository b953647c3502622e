"""Fused Pallas kernels for the hot spectral pipeline.

The headline path (BASELINE configs 1/3) is
``frame -> window -> rFFT -> |.| -> mel GEMM -> log1p -> affine-norm``.
XLA runs it well, but materializes the framed signal in HBM — an
``n_fft / hop`` (typically 4x) blow-up of the input bytes — and the DFT/mel
GEMM pair round-trips intermediates through HBM between fusions.

Kernel design (v3, round 2):

* **Chunk-factored formulation (default for cosine-sum windows).**  The
  windowed frame DFT factors as a K=hop chunk GEMM (computed once per hop
  of signal, reused by all ``overlap`` covering frames), an exact twiddle
  combine (sign/swap lane selects for overlap 2/4, where the twiddles are
  exactly {1,-i,-1,i}), and a P-tap hermitian spectral convolution for the
  window (hann/hamming P=1, blackman P=2) — ~overlap-fold fewer MXU FLOPs
  than the direct windowed GEMM, and all intermediates stay in VMEM (as an
  XLA graph the same math is HBM-bound and 1.8x slower, ops/fft.py).
  Measured 21.3M frames/s vs 15.7-17.1M for the XLA fused paths.
* **Time-tiled, pipelined input.**  The signal rows are block-specced with a
  ``pl.Element`` window of ``tile_t + halo`` rows starting at ``t * tile_t``
  — overlapping blocks, so Mosaic double-buffers the HBM fetch of tile t+1
  behind tile t's MXU work, and arbitrarily long signals stream through a
  fixed VMEM footprint (the round-1 kernel loaded the whole signal row per
  grid step: no pipelining and a hard VMEM ceiling — VERDICT.md weak #1).
* **Adaptive tile size.**  ``tile_t`` is chosen per call so the padded frame
  count ``n_tiles * tile_t`` hugs the true frame count (sublane-aligned),
  instead of rounding T up to a fixed 128 multiple (11%+ wasted MXU work at
  the headline shape).
* **Full-K fallback** (non-cosine windows, e.g. the DGT gaussian): frames
  are assembled in VMEM scratch as rolled row-shifts of the aligned
  hop-chunk block; the window-folded DFT runs as full-K MXU contractions —
  overlapping frames never touch HBM, and all intermediates (DFT real/imag,
  magnitudes, mel) stay in VMEM.
* The GEMMs use a manual bf16x3 decomposition (the ``Precision.HIGH``
  algorithm; Mosaic only accepts DEFAULT dot precision) with *bit-masked*
  splits — measured 5.2e-5 vs float64 end to end, slightly better than the
  XLA chain's 8.1e-5 (BENCH_NOTES.md).
* **Fused fit epilogue** (:func:`fused_melspec_stats`): a stats-only kernel
  computes the masked ``sum / sumsq / min / max`` of the contrasted
  magnitude entirely on-chip — ``Normalize.fit`` over a spectrogram without
  ever materializing the spectrogram (or the 4x framed signal) in HBM.
  This is the capability the XLA path cannot express: its fit must write
  the framed signal out and read it back.  Matches the reference quirk of
  fitting on the *non-mel* contrasted magnitude (spectral_repr.py:242-245).

Bin/mel dimensions are zero-padded to lane multiples (128); callers slice the
valid region (handled by :func:`fused_melspec`).

**Nyquist-depadded lane layout (r3.6, :func:`_nyq_depad`).**  The rFFT bin
count ``F = n_fft//2 + 1`` is one past a lane multiple at every 256-multiple
n_fft, so padding 513 -> 640 lanes wasted 25% of every GEMM's N dim at the
headline shape (50% at n_fft=512).  The GEMMs now run at exactly ``F - 1``
lanes; the nyquist bin — real, basis column ``(-1)^n`` — is computed as an
exact f32 VPU reduce (more accurate than the bf16x3 GEMM it replaces) and
re-appended as one extra 128-lane block, so mel/contrast/output keep the
old layout.  Measured: factored headline 27.7 -> 29.4M frames/s, full-K
gaussian (DGT) 15.6 -> 17.8M — the full-K kernel now beats the XLA fused
path, so DGT chains ride the kernel too (fuse.py:_pallas_preferred).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fft import _chunk_dft_matrices, _dft_matrices, _twiddles

__all__ = [
    "fused_melspec", "fused_melspec_stats", "fused_spectral_repr",
    "mel_block_structure",
]

LANE = 128

# full-K operand layouts switch to the no-duplication [hi; lo] stacks at
# this n_fft (VMEM capacity, r3.6c) — module-level so tests can lower it
# to exercise the layout at cheap shapes
NODUP_MIN_NFFT = 4096


def mel_block_structure(bank) -> Optional[tuple]:
    """Nonzero 128-block structure of a (concrete) mel bank, or None if dense.

    Returns ``blocks[j] = tuple of nonzero row-blocks of column-block j`` on
    the lane-padded (Fp, Mp) grid — the static argument :func:`_mel3` uses to
    skip zero blocks of the banded square bank (exact).  Returns None when
    skipping saves <20% (e.g. the 128-mel MFCC bank, where every row block
    touches the single column block).
    """
    bank = np.asarray(bank)
    Fp = _round_up(bank.shape[0], LANE)
    Mp = _round_up(bank.shape[1], LANE)
    P = np.zeros((Fp, Mp), np.float32)
    P[: bank.shape[0], : bank.shape[1]] = bank
    blocks = tuple(
        tuple(
            i
            for i in range(Fp // LANE)
            if np.any(P[i * LANE: (i + 1) * LANE, j * LANE: (j + 1) * LANE])
        )
        for j in range(Mp // LANE)
    )
    if sum(map(len, blocks)) >= (Fp // LANE) * (Mp // LANE) * 0.8:
        return None
    return blocks


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile(T: int, target: int = 256) -> int:
    """Sublane-aligned tile size minimizing pad waste around ``target`` rows."""
    if T <= target:
        return _round_up(max(T, 8), 8)
    n_tiles = -(-T // target)
    return _round_up(-(-T // n_tiles), 8)


def _forward_tile_target(n_fft: int) -> int:
    """Frames-per-grid-step target for the forward kernels: bigger tiles
    amortize per-step overhead (r3 sweep: 696 rows -> +1.7% over 232 at the
    headline shape), scaled down with n_fft so the in-flight C/output blocks
    respect the VMEM budget at 2048/4096."""
    return max(128, 704 * 1024 // n_fft)


def _split_bf16(m: jnp.ndarray):
    """Split f32 into an exactly-representable bf16 high part + bf16 residual.

    The high part is produced by *bit-masking* the low 16 mantissa bits
    rather than a bf16 round-trip cast: Mosaic canonicalizes
    ``x.astype(bf16).astype(f32)`` to a no-op, which would zero the residual
    and silently collapse the 3-pass product to single-pass bf16 (observed:
    1e-2 error instead of 1e-5).
    """
    bits = jax.lax.bitcast_convert_type(m, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )
    lo = m - hi_f32
    return hi_f32.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def _atan_poly_coeffs(deg: int = 9) -> tuple:
    """Power-basis coefficients ``c_k`` of ``atan(t) ~= t * sum_k c_k t^{2k}``
    on [0, 1], least-squares fit at Chebyshev nodes.  ``atan(sqrt(s))/sqrt(s)``
    is analytic on [0, 1] with its nearest singularity at s = -1, so the
    coefficients decay like ``(3 + 2*sqrt(2))^-k`` — deg 9 reaches ~1e-8,
    far inside the library's 1e-4 phase budget."""
    n = 256
    t = (np.cos((2 * np.arange(n) + 1) * np.pi / (2 * n)) + 1.0) / 2.0
    t = t[t > 1e-9]
    A = np.stack([t ** (2 * i) for i in range(deg + 1)], axis=1)
    c, *_ = np.linalg.lstsq(A, np.arctan(t) / t, rcond=None)
    return tuple(float(v) for v in c)


_ATAN_C = _atan_poly_coeffs()


def _atan2(y, x):
    """Four-quadrant arctangent on the VPU (Mosaic lowers neither ``atan2``
    nor ``atan``): octant range reduction + the :func:`_atan_poly_coeffs`
    even polynomial, |err| <~ 1e-6 rad vs ``jnp.arctan2``.

    ``atan2(0, 0) = 0``; the ``y == -0.0`` convention collapses to
    ``sign(y) = +1`` (numpy would give -pi at ``(-0.0, x<0)``) — the chain's
    nyquist/silent bins carry tiny-noise imaginary parts that make the
    ±pi choice unstable between any two backends, so phase comparisons are
    wrap-aware throughout (tests compare ``e^{i.phase}``)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, jnp.float32(np.finfo(np.float32).tiny))
    u = t * t
    p = jnp.float32(_ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        p = p * u + jnp.float32(c)
    r = t * p
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _read_block(x_ref):
    """Read this grid step's input rows, converting int16 PCM on the VPU.

    The int16 contract (``fused_melspec`` docstring): samples are PCM,
    interpreted as ``x / 32768`` — the exact convention of
    ``utils.misc.import_data``.  The scale is a power of two, so the
    convert+scale only shifts exponents: every downstream product is
    bit-identical to feeding ``x.astype(f32) * 2**-15`` from HBM, while
    the input DMA (the largest term of the kernel's bandwidth floor,
    BENCH_NOTES.md stage budget) moves half the bytes."""
    block = x_ref[0]
    if block.dtype == jnp.int16:
        block = block.astype(jnp.float32) * (2.0 ** -15)
    return block


def _tile_spectrum(
    x_ref, basis_ref, scr_ref, *, overlap, hop, tile_t,
    wnyq_ref=None, n_bins=None, x4=False,
):
    """Assemble this tile's frames in VMEM and return the windowed DFT as
    ``(re, im, nyq)`` — each (tile_t, Fp) f32, ``nyq`` a (tile_t, 1) f32
    column holding the exact real nyquist bin in the :func:`_nyq_depad`
    layout (None otherwise).

    Full-K windowed DFT for non-cosine windows (the DGT gaussian): the 3
    bf16x3 passes x 2 (re/im) run as TWO GEMMs against the pre-stacked
    (3 n_fft, 2 Fp) window-folded basis ``[B_hi; B_lo; B_hi]`` —
    ``hi @ B_hi`` plus ``[hi | lo] @ [B_lo; B_hi]`` — so the hi operand is
    never duplicated in scratch.

    With the :func:`_nyq_depad` layout (``Fp == n_bins - 1``) the basis
    holds bins ``0..N-1`` only; the nyquist bin is an exact f32 reduce of
    the assembled frame against ``wnyq_ref`` (the windowed ``(-1)^n`` row)
    and is re-appended by :func:`_append_nyq` — 20% fewer MACs on the
    dominant GEMM at n_fft=1024 (33% at 512).
    """
    f32 = jnp.float32
    block = _read_block(x_ref)            # (tile_t + halo, hop), halo rows follow
    n_block = block.shape[0]
    n_fft = overlap * hop
    # roll the f32 hop-chunk block (Mosaic rotate is 32-bit only), split the
    # small rolled piece, and write the bf16 halves straight into the
    # [hi | lo] layout — no f32 frame scratch, no full-width split, no
    # concat, and no duplicated hi operand: the bf16x3 product runs as
    # hi @ B_hi + [hi | lo] @ [B_lo; B_hi] (basis_ref stacked accordingly)
    for j in range(overlap):
        # frame i needs rows i..i+overlap-1: upward shift by j == roll by n-j
        rj = pltpu.roll(block, shift=(n_block - j) % n_block, axis=0)[:tile_t, :]
        hi_j, lo_j = _split_bf16(rj)
        scr_ref[:, j * hop: (j + 1) * hop] = hi_j
        scr_ref[:, n_fft + j * hop: n_fft + (j + 1) * hop] = lo_j

    Fp = basis_ref.shape[1] // 2
    if basis_ref.shape[0] == 2 * n_fft:
        # no-duplication basis layout [B_hi; B_lo] (n_fft >= 4096): the
        # 3-stack's duplicated hi rows would push the basis alone to
        # ~100 MB of VMEM (measured stack OOM at 4096); identical MACs as
        # [hi | hi] @ [B_hi; B_lo] + lo @ B_hi (the hi operand dup is a
        # cheap (tile, 2 n_fft) transient, the 33 MB basis dup is not)
        hi = scr_ref[:, :n_fft]
        dup_hi = jnp.concatenate([hi, hi], axis=1)
        Z = jnp.dot(
            dup_hi, basis_ref[...], preferred_element_type=f32
        ) + jnp.dot(
            scr_ref[:, n_fft:], basis_ref[:n_fft, :],
            preferred_element_type=f32,
        )
        if x4:
            Z = Z + jnp.dot(
                scr_ref[:, n_fft:], basis_ref[n_fft:, :],
                preferred_element_type=f32,
            )
    else:
        Z = jnp.dot(
            scr_ref[:, :n_fft], basis_ref[:n_fft, :], preferred_element_type=f32
        ) + jnp.dot(
            scr_ref[...], basis_ref[n_fft:, :], preferred_element_type=f32
        )
        if x4:
            # 4th bf16 product (lo @ B_lo, the term bf16x3 drops) for the
            # large-n_fft accuracy region — the lo operand and the B_lo
            # rows are already in scratch / the basis stack: ONE more dot
            Z = Z + jnp.dot(
                scr_ref[:, n_fft:], basis_ref[n_fft: 2 * n_fft, :],
                preferred_element_type=f32,
            )
    re, im = Z[:, :Fp], Z[:, Fp:]
    if n_bins is None or Fp != n_bins - 1:
        return re, im, None
    # depadded layout: nyquist = exact f32 reduce of the frame (hi + lo
    # reconstructs it exactly) against the windowed (-1)^n row
    w = wnyq_ref[0, :][None, :]
    nyq = jnp.sum(
        scr_ref[:, :n_fft].astype(f32) * w, axis=1, keepdims=True
    ) + jnp.sum(scr_ref[:, n_fft:].astype(f32) * w, axis=1, keepdims=True)
    return re, im, nyq


def _tile_magnitude(
    x_ref, basis_ref, scr_ref, *, overlap, hop, tile_t, power=1.0,
    wnyq_ref=None, n_bins=None, x4=False,
):
    """|windowed DFT| (tile_t, Fp[+LANE]) over :func:`_tile_spectrum`."""
    re, im, nyq = _tile_spectrum(
        x_ref, basis_ref, scr_ref, overlap=overlap, hop=hop, tile_t=tile_t,
        wnyq_ref=wnyq_ref, n_bins=n_bins, x4=x4,
    )
    sq = re * re + im * im
    sq = sq if power == 2.0 else jnp.sqrt(sq)
    if nyq is None:
        return sq
    nyval = nyq * nyq if power == 2.0 else jnp.abs(nyq)
    return _append_nyq(sq, nyval)


def _chunk_dots(x_ref, basis_ref, ablate=None, x4=False, nyq=False):
    """The MXU half of the factored formulation: bf16x3 chunk-DFT dots.

    The 3 bf16x3 passes x 2 (re/im) run as ONE stacked GEMM:
    ``[hi | hi | lo] (rows, 3 hop) @ [[Chi Shi]; [Clo Slo]; [Chi Shi]]
    (3 hop, 2 Fp)`` — identical MACs, one MXU dispatch instead of six.
    ``basis_ref`` is the pre-stacked (3 hop, 2 Fp) bf16 operand
    (:func:`_stack_basis`, built once outside the kernel).

    ``x4`` adds the fourth product (``lo @ B_lo``) for the large-n_fft
    accuracy region: the SAME [top; mid; top] basis stack contains both
    operand orders as contiguous row windows, so it is two dots against
    the same ``[hi | lo]`` operand — ``rows[:2 hop]`` gives
    ``hi@top + lo@mid`` and ``rows[hop:]`` gives ``hi@mid + lo@top``.

    ``nyq`` (the :func:`_nyq_depad` layout) additionally returns the
    nyquist chunk column ``C[c, N] = sum_r x[c*hop + r] * (-1)^r`` as an
    exact f32 VPU reduce — the basis holds only bins ``0..F-2``.
    """
    f32 = jnp.float32
    block = _read_block(x_ref)            # (tile_t + halo, hop)
    hop = block.shape[1]
    Fp = basis_ref.shape[1] // 2
    cnyq = None
    if nyq:
        r = jax.lax.broadcasted_iota(jnp.int32, (1, hop), 1)
        alt = (1 - 2 * (r & 1)).astype(f32)
        cnyq = jnp.sum(block * alt, axis=1, keepdims=True)  # (rows, 1) f32
    if ablate == "dots1":                 # timing-only: single-pass bf16
        bh = block.astype(jnp.bfloat16)
        CZ = jnp.dot(bh, basis_ref[:hop, :], preferred_element_type=f32)
        return CZ[:, :Fp], CZ[:, Fp:], cnyq
    bh, bl = _split_bf16(block)
    stacked = jnp.concatenate([bh, bl], axis=1)         # (rows, 2*hop) bf16
    if x4:
        CZ = jnp.dot(
            stacked, basis_ref[: 2 * hop, :], preferred_element_type=f32
        ) + jnp.dot(stacked, basis_ref[hop:, :], preferred_element_type=f32)
        return CZ[:, :Fp], CZ[:, Fp:], cnyq
    # 2-dot no-dup split: hi @ [top] + [hi | lo] @ [mid; top] — same MACs as
    # the 3-stack, without duplicating the hi operand
    CZ = jnp.dot(
        bh, basis_ref[:hop, :], preferred_element_type=f32
    ) + jnp.dot(stacked, basis_ref[hop:, :], preferred_element_type=f32)
    return CZ[:, :Fp], CZ[:, Fp:], cnyq


def _stack_basis(cc_hi, cc_lo, cs_hi, cs_lo):
    """Pre-stacked bf16x3 chunk basis for :func:`_chunk_dots` (3 hop, 2 Fp)."""
    top = jnp.concatenate([cc_hi, cs_hi], axis=1)
    mid = jnp.concatenate([cc_lo, cs_lo], axis=1)
    return jnp.concatenate([top, mid, top], axis=0)


def _stack_basis_nodup(cc_hi, cc_lo, cs_hi, cs_lo):
    """[B_hi; B_lo] (2 K, 2 Fp) basis without the 3-stack's duplicated hi
    rows — the large-n_fft full-K VMEM diet (:func:`_tile_magnitude`)."""
    top = jnp.concatenate([cc_hi, cs_hi], axis=1)
    mid = jnp.concatenate([cc_lo, cs_lo], axis=1)
    return jnp.concatenate([top, mid], axis=0)


def _stack_mel(mel_hi, mel_lo):
    """[hi; lo; hi]-interleaved per 128-row-block mel operand (3 Fp, Mp), so
    the banded :func:`_mel3` reads block (i, j) as contiguous rows."""
    Fp, Mp = mel_hi.shape
    hi = mel_hi.reshape(Fp // LANE, LANE, Mp)
    lo = mel_lo.reshape(Fp // LANE, LANE, Mp)
    return jnp.stack([hi, lo, hi], axis=1).reshape(3 * Fp, Mp)


def _stack_mel_nodup(mel_hi, mel_lo):
    """[hi; lo]-interleaved (2 Fp, Mp) variant of :func:`_stack_mel` for the
    large-n_fft VMEM-pressure region — no duplicated hi rows; :func:`_mel3`
    compensates with a duplicated (cheap) mag operand."""
    Fp, Mp = mel_hi.shape
    hi = mel_hi.reshape(Fp // LANE, LANE, Mp)
    lo = mel_lo.reshape(Fp // LANE, LANE, Mp)
    return jnp.stack([hi, lo], axis=1).reshape(2 * Fp, Mp)


def _append_nyq(sq, nyval):
    """Re-append the nyquist bin (depadded layout) as lane 0 of one extra
    128-lane block, restoring the padded ``(tile_t, Fd + LANE)`` layout the
    downstream mel/contrast/output stages expect."""
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (sq.shape[0], LANE), 1)
    blk = jnp.where(lane0 == 0, nyval, 0.0)
    return jnp.concatenate([sq, blk], axis=1)


def _combine_taps_complex(Cre, Cim, twr_ref, twi_ref, *, taps, overlap, tile_t, n_bins, ablate=None, cnyq=None):
    """The VPU half: twiddle combine + P-tap window conv -> ``(Yre, Yim,
    Ynyq)`` — the windowed DFT tile as real/imaginary (tile_t, Fp) parts
    plus the exact real nyquist column (depadded layout; None otherwise).

    ``cnyq`` (set iff the :func:`_nyq_depad` layout is active) carries the
    per-chunk nyquist column; the lanes then hold bins ``0..N-1`` only
    (``N = n_bins - 1 == Fp``), the nyquist output is computed from
    ``cnyq`` + the top in-array lanes, and re-appended by
    :func:`_append_nyq`.  The twiddle at the nyquist bin is
    ``(-1)**(j*hop) = +1`` (hop even, gated by ``_nyq_depad``), so its
    combine is a plain sum over the covering chunks.
    """
    Fp = Cre.shape[-1]
    depad = cnyq is not None
    if ablate == "combine":               # timing-only: skip the twiddle sum
        Xre, Xim = Cre[:tile_t], Cim[:tile_t]
        return Xre, Xim, (Xre[:, :1] * 0.0 if depad else None)
    if ablate == "noconv":                # timing-only: combine, no taps conv
        taps = (taps[0],)
    Xre = Xim = Xnyq = None
    for j in range(overlap):
        cr = Cre[j: j + tile_t]
        ci = Cim[j: j + tile_t]
        if depad:
            nj = cnyq[j: j + tile_t]
            Xnyq = nj if Xnyq is None else Xnyq + nj
        if overlap in (2, 4):
            # the twiddles e^{-2 pi i j k / overlap} are exactly {1,-i,-1,i}
            # (jk mod 4 selects which): the combine is sign/swap lane selects
            # on iota-derived masks, not runtime FMAs — less VPU time than
            # multiplying by the (0/±1-valued) twiddle rows.  Masks are
            # (1, Fp) rows; captured-constant restrictions rule out
            # precomputed tables.
            # r4 = (j*k*4/overlap) mod 4, via lane iota
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, Fp), 1)
            r = (lane * (j * (4 // overlap))) & 3
            if (j * (4 // overlap)) % 4 == 0:
                re_j, im_j = cr, ci
            else:
                one = jnp.float32(1.0)
                sgn_re = jnp.where(r <= 1, one, -one)
                sgn_im = jnp.where((r == 0) | (r == 3), one, -one)
                swap = (r & 1) == 1
                re_j = jnp.where(swap, ci, cr) * sgn_re
                im_j = jnp.where(swap, cr, ci) * sgn_im
        else:
            twr = twr_ref[j, :][None, :]
            twi = twi_ref[j, :][None, :]
            re_j = twr * cr - twi * ci
            im_j = twr * ci + twi * cr
        Xre = re_j if Xre is None else Xre + re_j
        Xim = im_j if j == 0 else Xim + im_j

    # P-tap hermitian conv along lanes: Y[k] = sum_p c_p X[k-p] with
    # X[-m] = conj(X[m]), X[N+m] = conj(X[N-m]) (N = nyquist lane).
    # Lanes >= n_bins hold zeros (zero-padded basis columns), so circular
    # rolls bring zeros in; the hermitian edges are patched per-lane from
    # the complementary roll (conjugated).
    P = len(taps) - 1
    Fp = Xre.shape[-1]
    N = n_bins - 1
    shifts = sorted({s % Fp for p in range(1, P + 1)
                     for s in (p, -p, *[2 * k - p for k in range(p)],
                               *[p - 2 * i for i in range(p)])})
    rolls = {
        s: (pltpu.roll(Xre, shift=s, axis=1), pltpu.roll(Xim, shift=s, axis=1))
        for s in shifts
    }

    def at(s):
        s = s % Fp
        return (Xre, Xim) if s == 0 else rolls[s]

    lane = jax.lax.broadcasted_iota(jnp.int32, Xre.shape, 1)
    Yre = taps[0] * Xre
    Yim = taps[0] * Xim
    for p in range(1, P + 1):
        rp_re, rp_im = at(p)              # X[k-p]
        for k in range(p):                # lanes k < p: conj(X[p-k])
            sre, sim = at(2 * k - p)
            rp_re = jnp.where(lane == k, sre, rp_re)
            rp_im = jnp.where(lane == k, -sim, rp_im)
        lp_re, lp_im = at(-p)             # X[k+p]
        # lanes N-i need conj(X[N-p+i]); in the depadded layout lane N
        # itself is out of the array (i starts at 1) and lane N-p needs
        # the nyquist value X[N] = Xnyq (real) instead of a roll
        for i in range(0 if not depad else 1, p):
            sre, sim = at(p - 2 * i)
            lp_re = jnp.where(lane == N - i, sre, lp_re)
            lp_im = jnp.where(lane == N - i, -sim, lp_im)
        if depad:
            lp_re = jnp.where(lane == N - p, Xnyq, lp_re)
            lp_im = jnp.where(lane == N - p, 0.0, lp_im)
        Yre = Yre + taps[p] * (rp_re + lp_re)
        Yim = Yim + taps[p] * (rp_im + lp_im)

    if not depad:
        return Yre, Yim, None
    # nyquist output: Y[N] = c0 X[N] + sum_p c_p (X[N-p] + X[N+p]) with
    # X[N+p] = conj(X[N-p]) -> 2 Re X[N-p]; each Re is one masked reduce
    Ynyq = taps[0] * Xnyq
    for p in range(1, P + 1):
        re_np = jnp.sum(
            jnp.where(lane == N - p, Xre, 0.0), axis=1, keepdims=True
        )
        Ynyq = Ynyq + (2.0 * taps[p]) * re_np
    return Yre, Yim, Ynyq


def _combine_taps_mag(Cre, Cim, twr_ref, twi_ref, *, taps, overlap, tile_t,
                      n_bins, power=1.0, ablate=None, cnyq=None):
    """Magnitude over :func:`_combine_taps_complex` (the historical entry)."""
    Yre, Yim, Ynyq = _combine_taps_complex(
        Cre, Cim, twr_ref, twi_ref, taps=taps, overlap=overlap,
        tile_t=tile_t, n_bins=n_bins, ablate=ablate, cnyq=cnyq,
    )
    sq = Yre * Yre + Yim * Yim
    sq = sq if power == 2.0 else jnp.sqrt(sq)
    if Ynyq is None:
        return sq
    nyval = Ynyq * Ynyq if power == 2.0 else jnp.abs(Ynyq)
    return _append_nyq(sq, nyval)


def _tile_magnitude_factored(
    x_ref, basis_ref, twr_ref, twi_ref,
    *, taps, overlap, tile_t, n_bins, power=1.0, ablate=None, x4=False,
):
    """|windowed DFT| via the chunk factorization, entirely in VMEM.

    The cosine-sum window trick (ops/fft.py module comment): one K=hop chunk
    GEMM per hop of signal (reused by all ``overlap`` frames), an exact
    twiddle combine over the ``overlap`` covering chunks, and a P-tap
    hermitian spectral convolution for the window.  ~overlap-fold fewer MXU
    FLOPs than the windowed full-K DFT of :func:`_tile_magnitude` — and
    unlike the XLA graph of ``impl="factored"`` (measured HBM-bound, 1.8x
    slower than direct), the twiddle/taps intermediates here never leave
    VMEM, so the FLOP saving is realized.
    """
    depad = basis_ref.shape[1] // 2 == n_bins - 1
    Cre, Cim, cnyq = _chunk_dots(
        x_ref, basis_ref, ablate=ablate, x4=x4, nyq=depad
    )
    return _combine_taps_mag(
        Cre, Cim, twr_ref, twi_ref,
        taps=taps, overlap=overlap, tile_t=tile_t, n_bins=n_bins, power=power,
        ablate=ablate, cnyq=cnyq,
    )


def _apply_contrast(mag, contrast, eps):
    if contrast == "log1p":
        return jnp.log1p(mag)
    if contrast == "log":
        return jnp.log(jnp.maximum(mag, eps))
    if contrast == "log10":
        return jnp.log(jnp.maximum(mag, eps)) * (1.0 / np.log(10.0))
    return mag


def _mel3(mag, mel_hi_ref, mel_lo_ref, mel_blocks=None, x4=False):
    """bf16x3 mel GEMM; ``mel_blocks`` dispatches the block-banded form.

    The square mel bank (n_mels = n_bins) is effectively *bidiagonal* — each
    FFT bin feeds at most its two neighbouring mel filters — so at LANE=128
    block granularity only ~1/3 of the (Fp/128)^2 blocks are nonzero.
    ``mel_blocks[j]`` lists the nonzero row-blocks of column-block ``j``
    (computed exactly from the bank outside the kernel); skipping the zero
    blocks is EXACT and cuts the mel GEMM — the kernel's largest single
    stage, 1.14 ms of 3.75 at the headline shape — to ~32% of its FLOPs.

    ``x4`` adds the fourth bf16 product (``lo @ B_lo``, the term bf16x3
    drops) at +1/3 the mel MACs; the [hi; lo; hi] basis layout already
    contains both operand orders as contiguous row windows, so it is two
    dots against the SAME stacked ``[mag_hi | mag_lo]`` operand:
    ``rows[:2L]`` gives ``hi@B_hi + lo@B_lo`` and ``rows[L:3L]`` gives
    ``hi@B_lo + lo@B_hi``.  Used for n_fft >= 4096, where the mel stage's
    ~2e-5 bf16x3 residual is what pushes the pipeline past the 1e-4
    budget after the norm-shrinking log contrast (BENCH_NOTES.md).
    """
    f32 = jnp.float32
    mag_hi, mag_lo = _split_bf16(mag)
    nodup = mel_hi_ref.shape[0] == 2 * mag.shape[1]
    if mel_blocks is None:
        Fp = mag.shape[1]
        if nodup:
            # [M_hi; M_lo] operand (no duplicated hi rows — VMEM): bf16x3
            # = [hi|hi] @ [M_hi; M_lo] + lo @ M_hi; x4 adds lo @ M_lo by
            # widening the second dot to [lo|lo]
            basis = mel_hi_ref[...]
            d1 = jnp.dot(
                jnp.concatenate([mag_hi, mag_hi], axis=1), basis,
                preferred_element_type=f32,
            )
            if x4:
                return d1 + jnp.dot(
                    jnp.concatenate([mag_lo, mag_lo], axis=1), basis,
                    preferred_element_type=f32,
                )
            return d1 + jnp.dot(
                mag_lo, basis[:Fp], preferred_element_type=f32
            )
        basis = jnp.concatenate(
            [mel_hi_ref[...], mel_lo_ref[...], mel_hi_ref[...]], axis=0
        )
        if x4:
            stacked = jnp.concatenate([mag_hi, mag_lo], axis=1)
            return jnp.dot(
                stacked, basis[: 2 * Fp], preferred_element_type=f32
            ) + jnp.dot(stacked, basis[Fp:], preferred_element_type=f32)
        # one stacked GEMM for the 3 bf16x3 passes (see _chunk_dots)
        stacked = jnp.concatenate([mag_hi, mag_hi, mag_lo], axis=1)
        return jnp.dot(stacked, basis, preferred_element_type=f32)
    # banded: one stacked GEMM per nonzero (row, col) block pair;
    # mel_hi_ref holds the [hi; lo; hi]-interleaved layout (_stack_mel) so
    # block (i, j) is the contiguous rows [3i*LANE, (3i+3)*LANE) — or the
    # [hi; lo] no-dup layout (_stack_mel_nodup, rows [2i*LANE, (2i+2)*LANE))
    stk_mag = {}
    for rows in mel_blocks:
        for i in rows:
            if i not in stk_mag:
                ir = slice(i * LANE, (i + 1) * LANE)
                if nodup or x4:
                    stk_mag[i] = jnp.concatenate(
                        [mag_hi[:, ir], mag_lo[:, ir]], axis=1
                    )
                else:
                    stk_mag[i] = jnp.concatenate(
                        [mag_hi[:, ir], mag_hi[:, ir], mag_lo[:, ir]], axis=1
                    )
    cols = []
    for j, rows in enumerate(mel_blocks):
        jc = slice(j * LANE, (j + 1) * LANE)
        acc = None
        for i in rows:
            if nodup:
                blk = mel_hi_ref[2 * i * LANE: (2 * i + 2) * LANE, jc]
                hi_i = stk_mag[i][:, :LANE]
                part = jnp.dot(
                    jnp.concatenate([hi_i, hi_i], axis=1), blk,
                    preferred_element_type=f32,
                )
                lo_i = stk_mag[i][:, LANE:]
                if x4:
                    part = part + jnp.dot(
                        jnp.concatenate([lo_i, lo_i], axis=1), blk,
                        preferred_element_type=f32,
                    )
                else:
                    part = part + jnp.dot(
                        lo_i, blk[:LANE], preferred_element_type=f32
                    )
            elif x4:
                part = jnp.dot(
                    stk_mag[i],
                    mel_hi_ref[3 * i * LANE: (3 * i + 2) * LANE, jc],
                    preferred_element_type=f32,
                ) + jnp.dot(
                    stk_mag[i],
                    mel_hi_ref[(3 * i + 1) * LANE: (3 * i + 3) * LANE, jc],
                    preferred_element_type=f32,
                )
            else:
                part = jnp.dot(
                    stk_mag[i],
                    mel_hi_ref[3 * i * LANE: (3 * i + 3) * LANE, jc],
                    preferred_element_type=f32,
                )
            acc = part if acc is None else acc + part
        if acc is None:
            acc = jnp.zeros((mag.shape[0], LANE), f32)
        cols.append(acc)
    return jnp.concatenate(cols, axis=-1)


def _stats_update(mag, s_ref, *, tile_t, t_valid, off=0):
    """Accumulate masked (sum, sumsq, min, max) of this tile's ``mag`` into
    rows ``off..off+4`` of the (8, Fp) stats block shared by every grid
    step.  ``off=0`` also zeroes the upper half on the first step (a second
    channel's ``off=4`` update, if any, overwrites it right after)."""
    t = pl.program_id(1)
    row = t * tile_t + jax.lax.broadcasted_iota(jnp.int32, mag.shape, 0)
    valid = row < t_valid
    inf = jnp.float32(jnp.inf)
    part = jnp.concatenate(
        [
            jnp.where(valid, mag, 0.0).sum(0, keepdims=True),
            jnp.where(valid, mag * mag, 0.0).sum(0, keepdims=True),
            jnp.where(valid, mag, inf).min(0, keepdims=True),
            jnp.where(valid, mag, -inf).max(0, keepdims=True),
        ],
        axis=0,
    )  # (4, Fp)

    first = (pl.program_id(0) == 0) & (t == 0)

    @pl.when(first)
    def _init():
        s_ref[off: off + 4, :] = part
        if off == 0:
            s_ref[4:, :] = jnp.zeros_like(s_ref[4:, :])

    @pl.when(jnp.logical_not(first))
    def _accum():
        prev = s_ref[off: off + 4, :]
        s_ref[off: off + 4, :] = jnp.concatenate(
            [
                prev[0:2] + part[0:2],
                jnp.minimum(prev[2:3], part[2:3]),
                jnp.maximum(prev[3:4], part[3:4]),
            ],
            axis=0,
        )


def _forward_kernel(
    x_ref, basis_ref, wnyq_ref, mel_hi_ref, mel_lo_ref,
    aff_ref, o_ref, scr_ref, *, overlap, hop, tile_t, contrast, eps, use_mel,
    power=1.0, mel_blocks=None, x4=False, n_bins=None,
):
    mag = _tile_magnitude(
        x_ref, basis_ref, scr_ref,
        overlap=overlap, hop=hop, tile_t=tile_t, power=power,
        wnyq_ref=wnyq_ref, n_bins=n_bins, x4=x4,
    )
    if use_mel:
        mag = _mel3(mag, mel_hi_ref, mel_lo_ref, mel_blocks, x4=x4)
    mag = _apply_contrast(mag, contrast, eps)
    out = (mag - aff_ref[0, 0]) / aff_ref[0, 1]
    o_ref[0, :, :] = out.astype(o_ref.dtype)


def _forward_kernel_factored(
    x_ref, basis_ref, twr_ref, twi_ref,
    mel_hi_ref, mel_lo_ref, aff_ref, o_ref,
    *, taps, overlap, tile_t, n_bins, contrast, eps, use_mel, power=1.0,
    ablate=None, mel_blocks=None, x4=False,
):
    mag = _tile_magnitude_factored(
        x_ref, basis_ref, twr_ref, twi_ref,
        taps=taps, overlap=overlap, tile_t=tile_t, n_bins=n_bins, power=power,
        ablate=ablate, x4=x4,
    )
    if use_mel:
        mag = _mel3(mag, mel_hi_ref, mel_lo_ref, mel_blocks, x4=x4)
    mag = _apply_contrast(mag, contrast, eps)
    out = (mag - aff_ref[0, 0]) / aff_ref[0, 1]
    o_ref[0, :, :] = out.astype(o_ref.dtype)


def _repr_channels(
    re, im, nyq, mel_hi_ref, mel_lo_ref, prev_ref,
    *, second, tile_t, contrast, eps, use_mel, weighted, t_valid,
    mel_blocks=None, x4=False,
):
    """Pre-affine (channel1, channel2) of the two-channel representation.

    Shared by the forward epilogue (:func:`_repr_epilogue`, which applies
    the two normalizer affines and stores) and the fused-fit stats kernels
    (which reduce the raw channels — matching ``_Representation.fit``,
    whose statistics are taken on the pre-norm extraction; with
    ``use_mel=False`` channel 1 is the *non-mel* contrasted magnitude,
    the reference ``Magnitude.scale_data`` quirk).

    Channel 1 is the magnitude pipeline (|.| -> mel -> contrast) for
    ``second in ("phase", "if")`` or the real part for ``second == "imag"``
    (Cartesian); channel 2 is the phase / instantaneous-frequency /
    imaginary channel.

    ``second == "if"`` implements ``unwrap -> fdiff_forward`` (the IF
    transform's default stencil, transforms/spectral_repr.py) in its
    frame-local form: the unwrapped consecutive difference IS the wrapped
    principal difference, so no cross-frame cumsum is needed — row 0 passes
    the raw angle through, interior rows are ``wrap(ph[t] - ph[t-1]) / 2``
    (the last valid row skips the reference's pi division,
    ``d.at[:-1].divide(pi)``).  The previous tile's last phase row is
    carried in ``prev_ref`` VMEM scratch across the sequential grid steps;
    the t == 0 passthrough masks the (stale) carry at batch boundaries.
    Numerical note: the chain's unwrap accumulates a 2*pi-multiple cumsum
    whose float32 ulp grows with the wrap count (~2.4e-4 at 2000 rad);
    the local form has no such term — it is the MORE accurate evaluation
    of the same math, so parity tests compare wrap-aware.
    """
    pi = jnp.float32(np.pi)
    depad = nyq is not None
    if second == "imag":
        ch1 = _append_nyq(re, nyq) if depad else re
        ch2 = _append_nyq(im, 0.0) if depad else im
    else:
        mag = jnp.sqrt(re * re + im * im)
        if depad:
            mag = _append_nyq(mag, jnp.abs(nyq))
        if use_mel:
            mag = _mel3(mag, mel_hi_ref, mel_lo_ref, mel_blocks, x4=x4)
        ch1 = _apply_contrast(mag, contrast, eps)
        ph = _atan2(im, re)
        if depad:
            # the nyquist bin is exactly real: its angle is 0 or pi
            ph = _append_nyq(ph, jnp.where(nyq < 0, pi, 0.0))
        if second == "phase":
            ch2 = ph
        else:  # "if"
            rows_local = jax.lax.broadcasted_iota(jnp.int32, ph.shape, 0)
            rows = pl.program_id(1) * tile_t + rows_local
            prev_b = jnp.broadcast_to(prev_ref[0:1, :], ph.shape)
            ph_prev = pltpu.roll(ph, shift=1, axis=0)
            ph_prev = jnp.where(rows_local == 0, prev_b, ph_prev)
            diff = ph - ph_prev
            ddmod = jnp.mod(diff + pi, jnp.float32(2 * np.pi)) - pi
            ddmod = jnp.where((ddmod == -pi) & (diff > 0), pi, ddmod)
            dw = jnp.where(jnp.abs(diff) < pi, diff, ddmod)
            val = jnp.where(rows == 0, ph, dw * 0.5)
            val = jnp.where(
                rows == t_valid - 1, val, val * jnp.float32(1.0 / np.pi)
            )
            if weighted:
                # parabolic frame window (IF._weight_window), a static
                # function of the global frame index
                n = rows.astype(jnp.float32)
                Tf = float(t_valid)
                w = (1.5 * Tf) / (Tf * Tf - 1.0) * (
                    1.0 - ((n - (Tf / 2.0 - 1.0)) / (Tf / 2.0)) ** 2
                )
                val = val * w
            # carry this tile's last phase row for the next grid step
            prev_ref[0:1, :] = ph[tile_t - 1: tile_t, :]
            ch2 = val
    return ch1, ch2


def _repr_epilogue(
    re, im, nyq, mel_hi_ref, mel_lo_ref, aff_ref, o1_ref, o2_ref, prev_ref,
    *, second, tile_t, contrast, eps, use_mel, weighted, t_valid,
    mel_blocks=None, x4=False,
):
    """Two-channel forward epilogue: :func:`_repr_channels` followed by the
    two affine normalizers (``aff_ref`` rows: [off1, scale1, off2, scale2])
    and the HBM stores."""
    ch1, ch2 = _repr_channels(
        re, im, nyq, mel_hi_ref, mel_lo_ref, prev_ref, second=second,
        tile_t=tile_t, contrast=contrast, eps=eps, use_mel=use_mel,
        weighted=weighted, t_valid=t_valid, mel_blocks=mel_blocks, x4=x4,
    )
    o1_ref[0, :, :] = ((ch1 - aff_ref[0, 0]) / aff_ref[0, 1]).astype(
        o1_ref.dtype
    )
    o2_ref[0, :, :] = ((ch2 - aff_ref[0, 2]) / aff_ref[0, 3]).astype(
        o2_ref.dtype
    )


def _repr_kernel(
    x_ref, basis_ref, wnyq_ref, mel_hi_ref, mel_lo_ref, aff_ref,
    o1_ref, o2_ref, scr_ref, prev_ref, *, overlap, hop, tile_t, contrast,
    eps, use_mel, second, weighted, t_valid, mel_blocks=None, x4=False,
    n_bins=None,
):
    re, im, nyq = _tile_spectrum(
        x_ref, basis_ref, scr_ref, overlap=overlap, hop=hop, tile_t=tile_t,
        wnyq_ref=wnyq_ref, n_bins=n_bins, x4=x4,
    )
    _repr_epilogue(
        re, im, nyq, mel_hi_ref, mel_lo_ref, aff_ref, o1_ref, o2_ref,
        prev_ref, second=second, tile_t=tile_t, contrast=contrast, eps=eps,
        use_mel=use_mel, weighted=weighted, t_valid=t_valid,
        mel_blocks=mel_blocks, x4=x4,
    )


def _repr_kernel_factored(
    x_ref, basis_ref, twr_ref, twi_ref, mel_hi_ref, mel_lo_ref, aff_ref,
    o1_ref, o2_ref, prev_ref, *, taps, overlap, tile_t, n_bins, contrast,
    eps, use_mel, second, weighted, t_valid, mel_blocks=None, x4=False,
):
    depad = basis_ref.shape[1] // 2 == n_bins - 1
    Cre, Cim, cnyq = _chunk_dots(x_ref, basis_ref, x4=x4, nyq=depad)
    re, im, nyq = _combine_taps_complex(
        Cre, Cim, twr_ref, twi_ref, taps=taps, overlap=overlap,
        tile_t=tile_t, n_bins=n_bins, cnyq=cnyq,
    )
    _repr_epilogue(
        re, im, nyq, mel_hi_ref, mel_lo_ref, aff_ref, o1_ref, o2_ref,
        prev_ref, second=second, tile_t=tile_t, contrast=contrast, eps=eps,
        use_mel=use_mel, weighted=weighted, t_valid=t_valid,
        mel_blocks=mel_blocks, x4=x4,
    )


def _stats_kernel(
    x_ref, basis_ref, wnyq_ref,
    s_ref, scr_ref, *, overlap, hop, tile_t, contrast, eps, t_valid,
    n_bins=None,
):
    """Fused-fit epilogue over the windowed full-K DFT formulation."""
    mag = _tile_magnitude(
        x_ref, basis_ref, scr_ref,
        overlap=overlap, hop=hop, tile_t=tile_t,
        wnyq_ref=wnyq_ref, n_bins=n_bins,
    )
    mag = _apply_contrast(mag, contrast, eps)
    _stats_update(mag, s_ref, tile_t=tile_t, t_valid=t_valid)


def _stats_kernel_factored(
    x_ref, basis_ref, twr_ref, twi_ref,
    s_ref, *, taps, overlap, tile_t, n_bins, contrast, eps, t_valid,
):
    """Fused-fit epilogue over the chunk-factored formulation."""
    mag = _tile_magnitude_factored(
        x_ref, basis_ref, twr_ref, twi_ref,
        taps=taps, overlap=overlap, tile_t=tile_t, n_bins=n_bins,
    )
    mag = _apply_contrast(mag, contrast, eps)
    _stats_update(mag, s_ref, tile_t=tile_t, t_valid=t_valid)


def _repr_stats_kernel(
    x_ref, basis_ref, wnyq_ref, s_ref, scr_ref, prev_ref, *,
    overlap, hop, tile_t, contrast, eps, second, weighted, t_valid,
    n_bins=None,
):
    """Two-channel fused-fit epilogue (full-K): rows 0-3 of the stats block
    hold channel 1, rows 4-7 channel 2.  ``use_mel=False`` always — fit
    statistics are taken on the non-mel contrasted magnitude
    (``Magnitude.fit``, the reference ``scale_data`` quirk)."""
    re, im, nyq = _tile_spectrum(
        x_ref, basis_ref, scr_ref, overlap=overlap, hop=hop, tile_t=tile_t,
        wnyq_ref=wnyq_ref, n_bins=n_bins,
    )
    ch1, ch2 = _repr_channels(
        re, im, nyq, None, None, prev_ref, second=second, tile_t=tile_t,
        contrast=contrast, eps=eps, use_mel=False, weighted=weighted,
        t_valid=t_valid,
    )
    _stats_update(ch1, s_ref, tile_t=tile_t, t_valid=t_valid, off=0)
    _stats_update(ch2, s_ref, tile_t=tile_t, t_valid=t_valid, off=4)


def _repr_stats_kernel_factored(
    x_ref, basis_ref, twr_ref, twi_ref, s_ref, prev_ref, *,
    taps, overlap, tile_t, n_bins, contrast, eps, second, weighted, t_valid,
):
    """Two-channel fused-fit epilogue over the chunk-factored formulation."""
    depad = basis_ref.shape[1] // 2 == n_bins - 1
    Cre, Cim, cnyq = _chunk_dots(x_ref, basis_ref, nyq=depad)
    re, im, nyq = _combine_taps_complex(
        Cre, Cim, twr_ref, twi_ref, taps=taps, overlap=overlap,
        tile_t=tile_t, n_bins=n_bins, cnyq=cnyq,
    )
    ch1, ch2 = _repr_channels(
        re, im, nyq, None, None, prev_ref, second=second, tile_t=tile_t,
        contrast=contrast, eps=eps, use_mel=False, weighted=weighted,
        t_valid=t_valid,
    )
    _stats_update(ch1, s_ref, tile_t=tile_t, t_valid=t_valid, off=0)
    _stats_update(ch2, s_ref, tile_t=tile_t, t_valid=t_valid, off=4)


def _nyq_depad(n_fft: int, hop: int = 2) -> bool:
    """Whether the nyquist-depadded lane layout applies (see module note).

    The rFFT bin count ``F = n_fft//2 + 1`` is one past a lane multiple
    whenever ``n_fft % 256 == 0`` (512/1024/2048/4096 — every bench shape):
    padding 513 -> 640 lanes wastes 25% of every GEMM's N dim (50% at
    n_fft=512).  Instead the GEMMs run at exactly ``F - 1`` lanes and the
    nyquist bin is computed as an exact f32 VPU reduce, then re-appended as
    one extra 128-lane block so downstream stages (mel / contrast / output
    slicing) keep today's layout.  The factored path additionally needs an
    even hop so the nyquist twiddle ``(-1)**(j*hop)`` collapses to +1.
    """
    return (n_fft // 2) % LANE == 0 and hop % 2 == 0


def _weights(n_fft: int, window) -> tuple:
    F = n_fft // 2 + 1
    Fp = F - 1 if _nyq_depad(n_fft) else _round_up(F, LANE)
    C_np, S_np = _dft_matrices(n_fft)
    # fold the window in jnp: `window` may be a traced pytree leaf (e.g.
    # serving jits fuse_forward with the transform as an argument)
    w = jnp.asarray(window, dtype=jnp.float32)[:, None]
    if Fp < F:
        WC = w * jnp.asarray(C_np[:, :Fp])
        WS = w * jnp.asarray(S_np[:, :Fp])
        # windowed nyquist basis row w[n] * (-1)^n, padded to 8 sublanes
        alt = np.zeros((8, n_fft), np.float32)
        alt[0] = ((-1.0) ** np.arange(n_fft)).astype(np.float32)
        WNYQ = jnp.asarray(alt) * jnp.asarray(window, dtype=jnp.float32)[None, :]
    else:
        WC = w * jnp.asarray(np.pad(C_np, [(0, 0), (0, Fp - F)]))
        WS = w * jnp.asarray(np.pad(S_np, [(0, 0), (0, Fp - F)]))
        WNYQ = jnp.zeros((8, 8), jnp.float32)  # unused placeholder
    return F, Fp, WC, WS, WNYQ


def _factored_weights(n_fft: int, hop: int) -> tuple:
    """Chunk DFT basis (hop, Fp) + twiddle tables (8, Fp), lane-padded.

    With :func:`_nyq_depad`, ``Fp = F - 1`` exactly (no padding) and the
    kernel computes the nyquist bin from the chunk block directly."""
    F = n_fft // 2 + 1
    Fp = F - 1 if _nyq_depad(n_fft, hop) else _round_up(F, LANE)
    Cc, Cs = _chunk_dft_matrices(n_fft, hop)
    twr, twi = _twiddles(n_fft, hop)
    overlap = n_fft // hop
    rows = max(8, _round_up(overlap, 8))
    if Fp < F:
        CC = jnp.asarray(Cc[:, :Fp])
        CS = jnp.asarray(Cs[:, :Fp])
        TWR = jnp.asarray(np.pad(twr[:, :Fp], [(0, rows - overlap), (0, 0)]))
        TWI = jnp.asarray(np.pad(twi[:, :Fp], [(0, rows - overlap), (0, 0)]))
    else:
        CC = jnp.asarray(np.pad(Cc, [(0, 0), (0, Fp - F)]))
        CS = jnp.asarray(np.pad(Cs, [(0, 0), (0, Fp - F)]))
        TWR = jnp.asarray(np.pad(twr, [(0, rows - overlap), (0, Fp - F)]))
        TWI = jnp.asarray(np.pad(twi, [(0, rows - overlap), (0, Fp - F)]))
    return F, Fp, CC, CS, TWR, TWI


def _prepare_rows(x, n_fft, hop_length, center, tile_t):
    """Center-pad, pad to tiled row count + halo, reshape to hop rows.

    ONE concatenate builds the padded signal (reflect head, body, reflect
    tail, zero tail) — the previous two sequential ``jnp.pad`` calls each
    copied the full array through HBM and cost 0.85 ms of the headline
    pipeline's 4.6 ms (r3 floor sweep, tools/sweep_kernel_floor.py)."""
    B, L = x.shape
    overlap = n_fft // hop_length
    half = n_fft // 2
    if center:
        T = 1 + L // hop_length
        padded_len = L + 2 * half
    else:
        T = (L - n_fft) // hop_length + 1
        padded_len = L
    if tile_t is None:
        tile_t = _pick_tile(T, target=_forward_tile_target(n_fft))
    halo = _round_up(overlap - 1, 8)
    n_tiles = -(-T // tile_t)
    n_rows_total = n_tiles * tile_t + halo
    total = n_rows_total * hop_length
    if center and half >= L:
        # short clip (L <= n_fft//2): a single flip can't supply the whole
        # reflect pad — take the multi-reflection jnp.pad path (the extra
        # HBM copy is irrelevant at these sizes)
        x = jnp.pad(x, [(0, 0), (half, half)], mode="reflect")
        pieces = [x]
        if total > padded_len:
            pieces.append(jnp.zeros((B, total - padded_len), x.dtype))
        x = jnp.concatenate(pieces, axis=-1)[:, :total]
        return x.reshape(B, n_rows_total, hop_length), T, tile_t, halo, n_tiles
    pieces = []
    if center:
        pieces.append(jnp.flip(x[:, 1: half + 1], axis=-1))
    pieces.append(x)
    if center:
        pieces.append(jnp.flip(x[:, -half - 1: -1], axis=-1))
    if total > padded_len:
        pieces.append(jnp.zeros((B, total - padded_len), x.dtype))
    x = jnp.concatenate(pieces, axis=-1)[:, :total]
    return x.reshape(B, n_rows_total, hop_length), T, tile_t, halo, n_tiles


def _x_spec(tile_t, halo, hop, ablate=None):
    # Mosaic requires all dims of one spec to be Element (or none); the
    # element-indexed window overlaps tiles by `halo` rows so Mosaic can
    # pipeline the HBM fetch of tile t+1 behind tile t's MXU work.
    if ablate == "fixedin":  # timing-only: constant input block (no re-DMA)
        return pl.BlockSpec(
            (1, tile_t + halo, hop), lambda b, t: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(tile_t + halo), pl.Element(hop)),
        lambda b, t: (b, t * tile_t, 0),
        memory_space=pltpu.VMEM,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "contrast", "interpret", "tile_t", "taps",
        "n_bins", "power", "ablate", "mel_blocks", "x4", "out_dtype",
    ),
)
def _fused_call(
    x_rows, WC, WS, TWR, TWI, WNYQ, mel_p, aff,
    n_fft, hop_length, contrast, interpret, tile_t, taps, n_bins, power,
    ablate=None, mel_blocks=None, x4=False, out_dtype=jnp.float32,
):
    """One pallas_call of the forward kernel.  With ``taps`` set, WC/WS are
    the chunk basis and TWR/TWI the twiddle tables (factored formulation);
    otherwise WC/WS are the window-folded full-K basis and WNYQ the
    windowed nyquist row (depadded layout, :func:`_nyq_depad`)."""
    B, n_rows_total, hop = x_rows.shape
    overlap = n_fft // hop_length
    halo = _round_up(overlap - 1, 8)
    n_tiles = (n_rows_total - halo) // tile_t
    Fp = WC.shape[1]
    depad = Fp == n_bins - 1
    Fp_mag = Fp + LANE if depad else Fp   # lanes after nyquist re-append
    use_mel = mel_p is not None
    Mp = mel_p.shape[1] if use_mel else Fp_mag
    if mel_p is None:
        mel_p = jnp.zeros((Fp_mag, Fp_mag), jnp.float32)  # unused placeholder

    # no-dup operand layouts for the large-n_fft full-K path: the
    # [.;.;.]-stacked basis/mel duplicate their hi rows, which alone
    # overflows scoped VMEM at n_fft=4096 (measured 101.7M vs the 96M
    # limit); [hi; lo] layouts + duplicated (cheap) activation operands
    # run identical MACs in ~2/3 the weight VMEM
    nodup = taps is None and n_fft >= NODUP_MIN_NFFT
    wc_hi, wc_lo = _split_bf16(WC)
    ws_hi, ws_lo = _split_bf16(WS)
    mel_hi, mel_lo = _split_bf16(mel_p)
    if use_mel and mel_blocks is not None:
        # interleaved stacked operand; mel_lo becomes an unused stub
        mel_hi = (
            _stack_mel_nodup(mel_hi, mel_lo) if nodup
            else _stack_mel(mel_hi, mel_lo)
        )
        mel_lo = jnp.zeros((8, LANE), jnp.bfloat16)
    elif use_mel and nodup:
        # dense no-dup layout: plain [M_hi; M_lo] concat
        mel_hi = jnp.concatenate([mel_hi, mel_lo], axis=0)
        mel_lo = jnp.zeros((8, LANE), jnp.bfloat16)
    eps = float(np.finfo(np.float32).eps)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM)

    common = dict(
        grid=(B, n_tiles),
        out_specs=pl.BlockSpec(
            (1, tile_t, Mp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile_t, Mp), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # large n_fft (2048+) weight sets exceed the 16M default
            # scoped-vmem ceiling; the chip has far more
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    mel_aff_specs = [
        fixed(mel_hi.shape),
        fixed(mel_lo.shape),
        pl.BlockSpec((1, 2), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
    ]

    if taps is not None:
        # NOTE a two-stage software pipeline (MXU dots for tile t while the
        # VPU emits tile t-1 from double-buffered scratch) was built and
        # measured SLOWER (18.9 vs 20.7 M frames/s): the C scratch
        # write/read round-trip costs more than the stage overlap buys.
        # Straight-line per-tile dataflow is the winner.
        basis = _stack_basis(wc_hi, wc_lo, ws_hi, ws_lo)
        kernel = functools.partial(
            _forward_kernel_factored,
            taps=taps, overlap=overlap, tile_t=tile_t, n_bins=n_bins,
            contrast=contrast, eps=eps, use_mel=use_mel, power=power,
            ablate=ablate, mel_blocks=mel_blocks, x4=x4,
        )
        return pl.pallas_call(
            kernel,
            in_specs=[_x_spec(tile_t, halo, hop, ablate)]
            + [fixed((3 * hop, 2 * Fp))]
            + [fixed((TWR.shape[0], Fp))] * 2 + mel_aff_specs,
            **common,
        )(x_rows, basis, TWR, TWI, mel_hi, mel_lo, aff)

    basis = (
        _stack_basis_nodup(wc_hi, wc_lo, ws_hi, ws_lo) if nodup
        else _stack_basis(wc_hi, wc_lo, ws_hi, ws_lo)
    )
    if nodup:
        common["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the 67 MB no-dup basis + mel still needs headroom past the
            # 96 MB default; the v5e has 128 MB of VMEM
            vmem_limit_bytes=118 * 1024 * 1024,
        )
    kernel = functools.partial(
        _forward_kernel,
        overlap=overlap, hop=hop, tile_t=tile_t,
        contrast=contrast, eps=eps, use_mel=use_mel, power=power,
        mel_blocks=mel_blocks, x4=x4, n_bins=n_bins,
    )
    return pl.pallas_call(
        kernel,
        in_specs=[_x_spec(tile_t, halo, hop)]
        + [fixed(basis.shape), fixed(WNYQ.shape)] + mel_aff_specs,
        scratch_shapes=[pltpu.VMEM((tile_t, 2 * n_fft), jnp.bfloat16)],
        **common,
    )(x_rows, basis, WNYQ, mel_hi, mel_lo, aff)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "contrast", "interpret", "tile_t", "taps",
        "n_bins", "second", "weighted", "t_valid", "mel_blocks", "x4",
    ),
)
def _repr_call(
    x_rows, WC, WS, TWR, TWI, WNYQ, mel_p, aff,
    n_fft, hop_length, contrast, interpret, tile_t, taps, n_bins,
    second, weighted, t_valid, mel_blocks=None, x4=False,
):
    """One pallas_call of the two-channel representation kernel.

    Same weight plumbing as :func:`_fused_call`; emits (channel1, channel2)
    — see :func:`_repr_epilogue`.  ``second == "if"`` forces sequential
    ("arbitrary") grid semantics on the batch dim too, because the IF
    recurrence carries the previous tile's last phase row in scratch."""
    B, n_rows_total, hop = x_rows.shape
    overlap = n_fft // hop_length
    halo = _round_up(overlap - 1, 8)
    n_tiles = (n_rows_total - halo) // tile_t
    Fp = WC.shape[1]
    depad = Fp == n_bins - 1
    Fp_mag = Fp + LANE if depad else Fp
    use_mel = mel_p is not None and second != "imag"
    Mp = mel_p.shape[1] if use_mel else Fp_mag
    if mel_p is None or second == "imag":
        mel_p = jnp.zeros((Fp_mag, Fp_mag), jnp.float32)  # unused placeholder

    nodup = taps is None and n_fft >= NODUP_MIN_NFFT
    wc_hi, wc_lo = _split_bf16(WC)
    ws_hi, ws_lo = _split_bf16(WS)
    mel_hi, mel_lo = _split_bf16(mel_p)
    if use_mel and mel_blocks is not None:
        mel_hi = (
            _stack_mel_nodup(mel_hi, mel_lo) if nodup
            else _stack_mel(mel_hi, mel_lo)
        )
        mel_lo = jnp.zeros((8, LANE), jnp.bfloat16)
    elif use_mel and nodup:
        mel_hi = jnp.concatenate([mel_hi, mel_lo], axis=0)
        mel_lo = jnp.zeros((8, LANE), jnp.bfloat16)
    eps = float(np.finfo(np.float32).eps)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM)

    semantics = (
        ("arbitrary", "arbitrary") if second == "if"
        else ("parallel", "arbitrary")
    )
    common = dict(
        grid=(B, n_tiles),
        out_specs=[
            pl.BlockSpec(
                (1, tile_t, Mp), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_t, Fp_mag), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_tiles * tile_t, Mp), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles * tile_t, Fp_mag), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=(
                118 * 1024 * 1024 if nodup else 96 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )
    mel_aff_specs = [
        fixed(mel_hi.shape),
        fixed(mel_lo.shape),
        pl.BlockSpec((1, 4), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
    ]
    prev_scratch = pltpu.VMEM((8, Fp_mag), jnp.float32)

    if taps is not None:
        basis = _stack_basis(wc_hi, wc_lo, ws_hi, ws_lo)
        kernel = functools.partial(
            _repr_kernel_factored,
            taps=taps, overlap=overlap, tile_t=tile_t, n_bins=n_bins,
            contrast=contrast, eps=eps, use_mel=use_mel, second=second,
            weighted=weighted, t_valid=t_valid, mel_blocks=mel_blocks, x4=x4,
        )
        return pl.pallas_call(
            kernel,
            in_specs=[_x_spec(tile_t, halo, hop)]
            + [fixed((3 * hop, 2 * Fp))]
            + [fixed((TWR.shape[0], Fp))] * 2 + mel_aff_specs,
            scratch_shapes=[prev_scratch],
            **common,
        )(x_rows, basis, TWR, TWI, mel_hi, mel_lo, aff)

    basis = (
        _stack_basis_nodup(wc_hi, wc_lo, ws_hi, ws_lo) if nodup
        else _stack_basis(wc_hi, wc_lo, ws_hi, ws_lo)
    )
    kernel = functools.partial(
        _repr_kernel,
        overlap=overlap, hop=hop, tile_t=tile_t, contrast=contrast, eps=eps,
        use_mel=use_mel, second=second, weighted=weighted, t_valid=t_valid,
        mel_blocks=mel_blocks, x4=x4, n_bins=n_bins,
    )
    return pl.pallas_call(
        kernel,
        in_specs=[_x_spec(tile_t, halo, hop)]
        + [fixed(basis.shape), fixed(WNYQ.shape)] + mel_aff_specs,
        scratch_shapes=[
            pltpu.VMEM((tile_t, 2 * n_fft), jnp.bfloat16), prev_scratch,
        ],
        **common,
    )(x_rows, basis, WNYQ, mel_hi, mel_lo, aff)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "contrast", "interpret", "tile_t", "t_valid",
        "taps", "n_bins",
    ),
)
def _stats_call(
    x_rows, WC, WS, TWR, TWI, WNYQ,
    n_fft, hop_length, contrast, interpret, tile_t, t_valid, taps, n_bins,
):
    B, n_rows_total, hop = x_rows.shape
    overlap = n_fft // hop_length
    halo = _round_up(overlap - 1, 8)
    n_tiles = (n_rows_total - halo) // tile_t
    Fp = WC.shape[1]
    Fp_mag = Fp + LANE if Fp == n_bins - 1 else Fp

    wc_hi, wc_lo = _split_bf16(WC)
    ws_hi, ws_lo = _split_bf16(WS)
    eps = float(np.finfo(np.float32).eps)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM)

    common = dict(
        grid=(B, n_tiles),
        out_specs=pl.BlockSpec(
            (8, Fp_mag), lambda b, t: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, Fp_mag), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    if taps is not None:
        basis = _stack_basis(wc_hi, wc_lo, ws_hi, ws_lo)
        kernel = functools.partial(
            _stats_kernel_factored,
            taps=taps, overlap=overlap, tile_t=tile_t, n_bins=n_bins,
            contrast=contrast, eps=eps, t_valid=t_valid,
        )
        return pl.pallas_call(
            kernel,
            in_specs=[_x_spec(tile_t, halo, hop)]
            + [fixed((3 * hop, 2 * Fp))]
            + [fixed((TWR.shape[0], Fp))] * 2,
            **common,
        )(x_rows, basis, TWR, TWI)

    nodup = n_fft >= NODUP_MIN_NFFT
    basis = (
        _stack_basis_nodup(wc_hi, wc_lo, ws_hi, ws_lo) if nodup
        else _stack_basis(wc_hi, wc_lo, ws_hi, ws_lo)
    )
    if nodup:
        common["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=118 * 1024 * 1024,
        )
    kernel = functools.partial(
        _stats_kernel,
        overlap=overlap, hop=hop, tile_t=tile_t,
        contrast=contrast, eps=eps, t_valid=t_valid, n_bins=n_bins,
    )
    return pl.pallas_call(
        kernel,
        in_specs=[_x_spec(tile_t, halo, hop)]
        + [fixed(basis.shape), fixed(WNYQ.shape)],
        scratch_shapes=[pltpu.VMEM((tile_t, 2 * n_fft), jnp.bfloat16)],
        **common,
    )(x_rows, basis, WNYQ)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "contrast", "interpret", "tile_t", "t_valid",
        "taps", "n_bins", "second", "weighted",
    ),
)
def _repr_stats_call(
    x_rows, WC, WS, TWR, TWI, WNYQ,
    n_fft, hop_length, contrast, interpret, tile_t, t_valid, taps, n_bins,
    second, weighted,
):
    """Two-channel stats pallas_call: same plumbing as :func:`_stats_call`
    plus the IF carry scratch; the (8, Fp) output packs channel 1 in rows
    0-3 and channel 2 in rows 4-7 (see :func:`_stats_update`)."""
    B, n_rows_total, hop = x_rows.shape
    overlap = n_fft // hop_length
    halo = _round_up(overlap - 1, 8)
    n_tiles = (n_rows_total - halo) // tile_t
    Fp = WC.shape[1]
    Fp_mag = Fp + LANE if Fp == n_bins - 1 else Fp

    wc_hi, wc_lo = _split_bf16(WC)
    ws_hi, ws_lo = _split_bf16(WS)
    eps = float(np.finfo(np.float32).eps)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM)

    common = dict(
        grid=(B, n_tiles),
        out_specs=pl.BlockSpec(
            (8, Fp_mag), lambda b, t: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, Fp_mag), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    prev_scratch = pltpu.VMEM((8, Fp_mag), jnp.float32)

    if taps is not None:
        basis = _stack_basis(wc_hi, wc_lo, ws_hi, ws_lo)
        kernel = functools.partial(
            _repr_stats_kernel_factored,
            taps=taps, overlap=overlap, tile_t=tile_t, n_bins=n_bins,
            contrast=contrast, eps=eps, second=second, weighted=weighted,
            t_valid=t_valid,
        )
        return pl.pallas_call(
            kernel,
            in_specs=[_x_spec(tile_t, halo, hop)]
            + [fixed((3 * hop, 2 * Fp))]
            + [fixed((TWR.shape[0], Fp))] * 2,
            scratch_shapes=[prev_scratch],
            **common,
        )(x_rows, basis, TWR, TWI)

    nodup = n_fft >= NODUP_MIN_NFFT
    basis = (
        _stack_basis_nodup(wc_hi, wc_lo, ws_hi, ws_lo) if nodup
        else _stack_basis(wc_hi, wc_lo, ws_hi, ws_lo)
    )
    if nodup:
        common["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=118 * 1024 * 1024,
        )
    kernel = functools.partial(
        _repr_stats_kernel,
        overlap=overlap, hop=hop, tile_t=tile_t,
        contrast=contrast, eps=eps, second=second, weighted=weighted,
        t_valid=t_valid, n_bins=n_bins,
    )
    return pl.pallas_call(
        kernel,
        in_specs=[_x_spec(tile_t, halo, hop)]
        + [fixed(basis.shape), fixed(WNYQ.shape)],
        scratch_shapes=[
            pltpu.VMEM((tile_t, 2 * n_fft), jnp.bfloat16), prev_scratch,
        ],
        **common,
    )(x_rows, basis, WNYQ)


def _check_args(x, n_fft, hop_length, interpret):
    if n_fft % hop_length != 0:
        raise ValueError("fused kernels require hop | n_fft")
    if x.dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.int16)):
        raise ValueError(
            "fused kernels take float32 audio or int16 PCM, got %s" % x.dtype
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return interpret


def fused_melspec(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    mel_bank: Optional[jnp.ndarray] = None,
    offset: float = 0.0,
    scale: float = 1.0,
    contrast: str = "log1p",
    center: bool = True,
    interpret: Optional[bool] = None,
    tile_t: Optional[int] = None,
    taps: Optional[tuple] = None,
    power: float = 1.0,
    ablate: Optional[str] = None,
    mel_blocks: Optional[tuple] = None,
    x4: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Fused ``(B, L) -> (B, T, n_mels)`` mel-spectrogram pipeline.

    Equivalent to ``(contrast(|stft(x)| @ mel_bank) - offset) / scale`` with
    torch STFT conventions; everything after the centre padding runs in one
    Pallas kernel.  ``mel_bank=None`` skips the mel projection (plain
    contrasted magnitudes).  ``interpret`` defaults to True off-TPU so tests
    exercise the same kernel on CPU.  ``tile_t`` (frames per grid step) is
    chosen adaptively when None.  ``taps`` (cosine-sum window coefficients,
    ops/fft.py:taps_for_window) selects the chunk-factored formulation —
    ~overlap-fold fewer MXU FLOPs with all intermediates in VMEM.

    ``out_dtype`` is the *store* dtype of the result (default f32).  With
    ``jnp.bfloat16`` the whole pipeline still computes in f32/bf16x3 —
    only the final HBM store rounds (round-to-nearest-even), so the output
    is bit-identical to ``fused_melspec(...).astype(bfloat16)`` while
    halving the output DMA, the dominant term of the kernel's measured
    bandwidth floor (BENCH_NOTES.md stage budget).  Meant for training
    consumers that cast features to bf16 anyway; the f32 contract remains
    the default and the 1e-4 accuracy budget is stated for f32 only.

    ``x`` may be int16 PCM: samples are interpreted as ``x / 32768``
    (the ``utils.misc.import_data`` convention) and converted *inside the
    kernel* — int16→f32 is lossless and the power-of-two scale only
    shifts exponents, so the result is bit-identical to feeding
    ``x.astype(float32) / 32768`` while the input rows DMA half the
    bytes.  This is the raw-ingest serving contract: feature extraction
    straight from PCM buffers with no host-side float conversion.
    """
    if x.ndim == 1:
        return fused_melspec(
            x[None], n_fft, hop_length, window, mel_bank, offset, scale,
            contrast, center, interpret, tile_t, taps, power, ablate,
            mel_blocks, x4, out_dtype,
        )[0]
    interpret = _check_args(x, n_fft, hop_length, interpret)
    x_rows, T, tile_t, halo, _ = _prepare_rows(x, n_fft, hop_length, center, tile_t)

    if taps is not None:
        F, Fp, WC, WS, TWR, TWI = _factored_weights(n_fft, hop_length)
        WNYQ = jnp.zeros((8, 8), jnp.float32)  # unused placeholder
    else:
        F, Fp, WC, WS, WNYQ = _weights(n_fft, window)
        TWR = TWI = jnp.zeros((8, Fp), jnp.float32)  # unused placeholders
    Fp_mag = Fp + LANE if Fp == F - 1 else Fp
    if mel_bank is not None:
        M = mel_bank.shape[1]
        Mp = _round_up(M, LANE)
        mel_p = jnp.pad(jnp.asarray(mel_bank), [(0, Fp_mag - mel_bank.shape[0]), (0, Mp - M)])
        if mel_blocks is None and not isinstance(mel_bank, jax.core.Tracer):
            # banded-block dispatch (exact): see mel_block_structure.  A
            # traced bank (serving) can't be inspected here — fuse.py passes
            # the structure computed from the transform's static config.
            mel_blocks = mel_block_structure(mel_bank)
    else:
        M, mel_p = F, None
        mel_blocks = None

    aff = jnp.asarray([[offset, scale]], dtype=jnp.float32)
    out = _fused_call(
        x_rows, WC, WS, TWR, TWI, WNYQ, mel_p, aff,
        n_fft, hop_length, contrast, interpret, tile_t, taps, F, power,
        ablate, mel_blocks, x4, jnp.dtype(out_dtype),
    )
    return out[:, :T, :M]


def fused_spectral_repr(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    second: str,
    mel_bank: Optional[jnp.ndarray] = None,
    aff=(0.0, 1.0, 0.0, 1.0),
    contrast: str = "log1p",
    weighted: bool = False,
    center: bool = True,
    interpret: Optional[bool] = None,
    tile_t: Optional[int] = None,
    taps: Optional[tuple] = None,
    mel_blocks: Optional[tuple] = None,
    x4: bool = False,
) -> tuple:
    """Fused two-channel spectral representation ``(B, L) -> (y1, y2)``.

    One kernel pass computes BOTH channels of the stacked representation
    transforms (transforms/spectral_repr.py:SpectralRepresentation) from a
    single windowed DFT — the complex spectrogram never exists in HBM:

    - ``second="phase"`` (Polar): y1 = normalized mel/contrast magnitude,
      y2 = normalized ``angle`` (in-kernel :func:`_atan2`).
    - ``second="if"`` (PolarIF): y2 = normalized instantaneous frequency,
      the frame-local form of ``unwrap + fdiff_forward`` (the IF
      transform's default stencil; ``weighted`` applies the parabolic
      frame window).  Only the "forward" stencil is local — backward /
      central boundary rows need the globally-unwrapped last frame and
      stay on the XLA path (fuse.py declines them).
    - ``second="imag"`` (Cartesian): y1 = normalized real part, y2 =
      normalized imaginary part (mel/contrast unused).

    ``aff = (off1, scale1, off2, scale2)`` are the two Normalize affines.
    Returns float32 ``(y1[(B, T, M)], y2[(B, T, F)])``; trimming, the
    keep_nyquist bin-drop and the representation's ``stack`` are the
    caller's (fuse.py's).  Everything else — int16 PCM ingest, the
    chunk-factored vs full-K dispatch via ``taps``, the depadded nyquist
    layout, banded mel — matches :func:`fused_melspec`.
    """
    if second not in ("phase", "if", "imag"):
        raise ValueError("second must be 'phase', 'if' or 'imag'")
    if x.ndim == 1:
        y1, y2 = fused_spectral_repr(
            x[None], n_fft, hop_length, window, second, mel_bank, aff,
            contrast, weighted, center, interpret, tile_t, taps,
            mel_blocks, x4,
        )
        return y1[0], y2[0]
    interpret = _check_args(x, n_fft, hop_length, interpret)
    x_rows, T, tile_t, halo, _ = _prepare_rows(
        x, n_fft, hop_length, center, tile_t
    )

    if taps is not None:
        F, Fp, WC, WS, TWR, TWI = _factored_weights(n_fft, hop_length)
        WNYQ = jnp.zeros((8, 8), jnp.float32)  # unused placeholder
    else:
        F, Fp, WC, WS, WNYQ = _weights(n_fft, window)
        TWR = TWI = jnp.zeros((8, Fp), jnp.float32)  # unused placeholders
    Fp_mag = Fp + LANE if Fp == F - 1 else Fp
    use_mel = mel_bank is not None and second != "imag"
    if use_mel:
        M = mel_bank.shape[1]
        Mp = _round_up(M, LANE)
        mel_p = jnp.pad(
            jnp.asarray(mel_bank),
            [(0, Fp_mag - mel_bank.shape[0]), (0, Mp - M)],
        )
        if mel_blocks is None and not isinstance(mel_bank, jax.core.Tracer):
            mel_blocks = mel_block_structure(mel_bank)
    else:
        M, mel_p = F, None
        mel_blocks = None

    aff = jnp.asarray(aff, dtype=jnp.float32).reshape(1, 4)
    y1, y2 = _repr_call(
        x_rows, WC, WS, TWR, TWI, WNYQ, mel_p, aff,
        n_fft, hop_length, contrast, interpret, tile_t, taps, F,
        second, bool(weighted), T, mel_blocks, x4,
    )
    return y1[:, :T, :M], y2[:, :T, :F]


def fused_melspec_stats(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    contrast: str = "log1p",
    center: bool = True,
    interpret: Optional[bool] = None,
    tile_t: Optional[int] = None,
    taps: Optional[tuple] = None,
) -> dict:
    """One-pass fused fit statistics of ``contrast(|stft(x)|)``.

    Returns ``{"sum", "sumsq", "min", "max", "count"}`` scalars over the
    whole (batch, frames, bins) spectrogram without materializing it (or the
    framed signal) in HBM — the reduction runs in the kernel epilogue and a
    single (8, bins) block leaves the chip.  Stats are taken on the non-mel
    contrasted magnitude, matching the reference ``Magnitude.scale_data``
    quirk (spectral_repr.py:242-245).  ``taps``: see :func:`fused_melspec`.
    """
    if x.ndim == 1:
        x = x[None]
    x = x.reshape((-1, x.shape[-1]))
    interpret = _check_args(x, n_fft, hop_length, interpret)
    x_rows, T, tile_t, halo, _ = _prepare_rows(x, n_fft, hop_length, center, tile_t)
    if taps is not None:
        F, Fp, WC, WS, TWR, TWI = _factored_weights(n_fft, hop_length)
        WNYQ = jnp.zeros((8, 8), jnp.float32)
    else:
        F, Fp, WC, WS, WNYQ = _weights(n_fft, window)
        TWR = TWI = jnp.zeros((8, Fp), jnp.float32)

    s = _stats_call(
        x_rows, WC, WS, TWR, TWI, WNYQ,
        n_fft, hop_length, contrast, interpret, tile_t, T, taps, F,
    )
    B = x.shape[0]
    return {
        "sum": s[0, :F].sum(),
        "sumsq": s[1, :F].sum(),
        "min": s[2, :F].min(),
        "max": s[3, :F].max(),
        "count": B * T * F,
    }


def fused_repr_stats(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    second: str,
    contrast: str = "log1p",
    weighted: bool = False,
    center: bool = True,
    interpret: Optional[bool] = None,
    tile_t: Optional[int] = None,
    taps: Optional[tuple] = None,
) -> dict:
    """One-pass fused fit statistics for BOTH channels of a stacked
    spectral representation (:func:`fused_spectral_repr` channel math).

    Returns ``{"ch1": {...}, "ch2": {...}, "count"}`` where each channel
    dict holds ``sum/sumsq/min/max`` scalars over the whole
    (batch, frames, bins) extraction without materializing the complex
    spectrogram (or the framed signal) in HBM.  Channel 1 matches what the
    transforms fit on: the **non-mel** contrasted magnitude for
    Polar/PolarIF (``Magnitude.fit``, the reference ``scale_data`` quirk,
    spectral_repr.py:242-245) or the real part for Cartesian; channel 2 is
    the wrapped phase / frame-local IF / imaginary part — element-for-
    element the values ``_Representation.fit`` reduces (the IF row layout
    equals ``unwrap + fdiff_forward`` exactly, see
    :func:`_repr_channels`)."""
    if second not in ("phase", "if", "imag"):
        raise ValueError("second must be 'phase', 'if' or 'imag'")
    if x.ndim == 1:
        x = x[None]
    x = x.reshape((-1, x.shape[-1]))
    interpret = _check_args(x, n_fft, hop_length, interpret)
    x_rows, T, tile_t, halo, _ = _prepare_rows(x, n_fft, hop_length, center, tile_t)
    if taps is not None:
        F, Fp, WC, WS, TWR, TWI = _factored_weights(n_fft, hop_length)
        WNYQ = jnp.zeros((8, 8), jnp.float32)
    else:
        F, Fp, WC, WS, WNYQ = _weights(n_fft, window)
        TWR = TWI = jnp.zeros((8, Fp), jnp.float32)

    s = _repr_stats_call(
        x_rows, WC, WS, TWR, TWI, WNYQ,
        n_fft, hop_length, contrast, interpret, tile_t, T, taps, F,
        second, bool(weighted),
    )
    B = x.shape[0]

    def chan(r0):
        return {
            "sum": s[r0, :F].sum(),
            "sumsq": s[r0 + 1, :F].sum(),
            "min": s[r0 + 2, :F].min(),
            "max": s[r0 + 3, :F].max(),
        }

    return {"ch1": chan(0), "ch2": chan(4), "count": B * T * F}
