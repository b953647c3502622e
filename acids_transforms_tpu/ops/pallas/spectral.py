"""Fused Pallas kernel for the hot spectral pipeline.

The headline path (BASELINE configs 1/3) is
``frame -> window -> rFFT -> |.| -> mel GEMM -> log1p -> affine-norm``.
XLA runs it well, but materializes the framed signal in HBM — an
``n_fft / hop`` (typically 4x) blow-up of the input bytes — and the DFT/mel
GEMM pair round-trips intermediates through HBM between fusions.

This kernel assembles each tile's frames in VMEM scratch (rolled row-shifts
of one aligned hop-chunk block) and runs the window-folded DFT as full-K
MXU contractions — overlapping frames never touch HBM, and all intermediates
(DFT real/imag, magnitudes, mel) stay in VMEM.  The GEMMs use a manual bf16x3
decomposition (the ``Precision.HIGH`` algorithm; Mosaic only accepts DEFAULT
dot precision) with *bit-masked* splits — measured 5.2e-5 vs float64 end to
end, slightly better than the XLA chain's 8.1e-5 (BENCH_NOTES.md).

Bin/mel dimensions are zero-padded to lane multiples (128); callers slice the
valid region (handled by :func:`fused_melspec`).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fft import _dft_matrices

__all__ = ["fused_melspec"]

TILE_T = 128
LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


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


def _kernel(
    x_ref, wc_hi_ref, wc_lo_ref, ws_hi_ref, ws_lo_ref, mel_hi_ref, mel_lo_ref,
    aff_ref, o_ref, scr_ref, *, overlap, hop, n_bins_p, contrast, eps, use_mel,
):
    t = pl.program_id(1)
    f32 = jnp.float32

    # one aligned load per tile (sublane starts must be multiples of 8);
    # per-j row shifts are VPU rolls of the in-register block, written into a
    # VMEM scratch so the DFT runs as full-K (n_fft) MXU contractions instead
    # of `overlap` K=hop passes
    extra = -(-(overlap - 1) // 8) * 8
    block = x_ref[0, pl.ds(t * TILE_T, TILE_T + extra), :]  # (TILE_T+extra, hop)
    n_block = TILE_T + extra
    for j in range(overlap):
        # upward shift by j == non-negative roll by (n_block - j)
        scr_ref[:, j * hop: (j + 1) * hop] = pltpu.roll(
            block, shift=(n_block - j) % n_block, axis=0
        )[:TILE_T, :]

    frames = scr_ref[...]  # (TILE_T, n_fft) f32, window folded into WC/WS
    fr_hi, fr_lo = _split_bf16(frames)

    def dot3(b_hi_ref, b_lo_ref):
        return (
            jnp.dot(fr_hi, b_hi_ref[...], preferred_element_type=f32)
            + jnp.dot(fr_hi, b_lo_ref[...], preferred_element_type=f32)
            + jnp.dot(fr_lo, b_hi_ref[...], preferred_element_type=f32)
        )

    re = dot3(wc_hi_ref, wc_lo_ref)
    im = dot3(ws_hi_ref, ws_lo_ref)

    mag = jnp.sqrt(re * re + im * im)
    if use_mel:
        mag_hi, mag_lo = _split_bf16(mag)
        mag = (
            jnp.dot(mag_hi, mel_hi_ref[...], preferred_element_type=f32)
            + jnp.dot(mag_hi, mel_lo_ref[...], preferred_element_type=f32)
            + jnp.dot(mag_lo, mel_hi_ref[...], preferred_element_type=f32)
        )
    if contrast == "log1p":
        mag = jnp.log1p(mag)
    elif contrast == "log":
        mag = jnp.log(jnp.maximum(mag, eps))
    elif contrast == "log10":
        mag = jnp.log(jnp.maximum(mag, eps)) * (1.0 / np.log(10.0))
    offset = aff_ref[0, 0]
    scale = aff_ref[0, 1]
    o_ref[0, :, :] = (mag - offset) / scale


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "contrast", "interpret"),
)
def _fused_call(
    x_rows, WC, WS, mel_p, aff, n_fft, hop_length, contrast, interpret
):
    B, n_rows_total, hop = x_rows.shape
    overlap = n_fft // hop
    n_tiles = (n_rows_total - _round_up(overlap - 1, 8)) // TILE_T
    Fp = WC.shape[1]
    use_mel = mel_p is not None
    Mp = mel_p.shape[1] if use_mel else Fp
    if mel_p is None:
        mel_p = jnp.zeros((Fp, Fp), jnp.float32)  # unused placeholder

    wc_hi, wc_lo = _split_bf16(WC)
    ws_hi, ws_lo = _split_bf16(WS)
    mel_hi, mel_lo = _split_bf16(mel_p)

    kernel = functools.partial(
        _kernel,
        overlap=overlap,
        hop=hop,
        n_bins_p=Fp,
        contrast=contrast,
        eps=float(np.finfo(np.float32).eps),
        use_mel=use_mel,
    )

    def fixed(shape):
        return pl.BlockSpec(shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, n_rows_total, hop), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            fixed((n_fft, Fp)),
            fixed((n_fft, Fp)),
            fixed((n_fft, Fp)),
            fixed((n_fft, Fp)),
            fixed((Fp, Mp)),
            fixed((Fp, Mp)),
            pl.BlockSpec((1, 2), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_T, Mp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE_T, Mp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_T, n_fft), jnp.float32)],
        interpret=interpret,
    )(x_rows, wc_hi, wc_lo, ws_hi, ws_lo, mel_hi, mel_lo, aff)


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
) -> jnp.ndarray:
    """Fused ``(B, L) -> (B, T, n_mels)`` mel-spectrogram pipeline.

    Equivalent to ``(contrast(|stft(x)| @ mel_bank) - offset) / scale`` with
    torch STFT conventions; everything after the centre padding runs in one
    Pallas kernel.  ``mel_bank=None`` skips the mel projection (plain
    contrasted magnitudes).  ``interpret`` defaults to True off-TPU so tests
    exercise the same kernel on CPU.
    """
    if x.ndim == 1:
        return fused_melspec(
            x[None], n_fft, hop_length, window, mel_bank, offset, scale, contrast, center, interpret
        )[0]
    if n_fft % hop_length != 0:
        raise ValueError("fused_melspec requires hop | n_fft")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, L = x.shape
    overlap = n_fft // hop_length
    if center:
        x = jnp.pad(x, [(0, 0), (n_fft // 2, n_fft // 2)], mode="reflect")
    T = 1 + L // hop_length if center else (x.shape[-1] - n_fft) // hop_length + 1

    n_tiles = -(-T // TILE_T)
    # the kernel loads 8-row-aligned blocks of TILE_T + round_up(overlap-1, 8)
    n_rows_total = n_tiles * TILE_T + _round_up(overlap - 1, 8)
    x = jnp.pad(x, [(0, 0), (0, n_rows_total * hop_length - x.shape[-1])])
    x_rows = x.reshape(B, n_rows_total, hop_length)

    F = n_fft // 2 + 1
    Fp = _round_up(F, LANE)
    C_np, S_np = _dft_matrices(n_fft)
    w_np = np.asarray(window, dtype=np.float32)[:, None]
    WC = jnp.asarray(np.pad(w_np * C_np, [(0, 0), (0, Fp - F)]))
    WS = jnp.asarray(np.pad(w_np * S_np, [(0, 0), (0, Fp - F)]))

    if mel_bank is not None:
        M = mel_bank.shape[1]
        Mp = _round_up(M, LANE)
        mel_p = jnp.pad(jnp.asarray(mel_bank), [(0, Fp - mel_bank.shape[0]), (0, Mp - M)])
    else:
        M, mel_p = F, None

    aff = jnp.asarray([[offset, scale]], dtype=jnp.float32)
    out = _fused_call(
        x_rows, WC, WS, mel_p, aff, n_fft, hop_length, contrast, interpret
    )
    return out[:, :T, :M]
