"""Fused Griffin-Lim consistency projection: STFT(ISTFT(spec)) in one kernel.

Each Griffin-Lim iteration projects ``mag * angles`` onto the set of
consistent spectrograms via an ISTFT -> OLA -> STFT roundtrip.  The XLA
loop materializes the (4x) frame tensors and the signal in HBM every
iteration (measured 0.64 ms / iteration at the 1024/256, batch-8 shape —
partially HBM-bound).  This kernel runs the whole roundtrip per spectrogram
tile in VMEM using the chunk factorization in BOTH directions (cosine-sum
windows only):

  synthesis:  Y = taps_conv(mag . angles); D[c] = sum_j conj(tw_j) Y[c-j];
              samples[c] = D[c] @ (restricted inverse basis); / envelope
  analysis:   C[c] = samples[c] @ (chunk basis);
              X[t] = sum_j tw_j C[t+j]; rebuilt = taps_conv(X)

Boundary semantics: the roundtrip operates on the un-trimmed OLA signal
(length ``(T-1) hop + n_fft``) re-framed in place — identical to the
torch-convention trim + reflect-repad for all interior frames; the <=
``overlap-1`` edge frames differ (the reflect pad is replaced by the OLA
tails).  Griffin-Lim is random-seeded, so parity with the XLA loop is
*quality* (spectral convergence), not bit-equality — enforced by the tests.

Spectrogram rows outside [0, T) are zero-padded by the host wrapper, which
makes the OLA boundary math exact; the envelope (OLA of the squared
synthesis window over the true T frames) is computed host-side and fed
per-chunk.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fft import _chunk_dft_matrices, _twiddles
from ..framing import overlap_add
from .spectral import LANE, _pick_tile, _round_up, _split_bf16

__all__ = ["gl_project", "gl_project_available"]

HALO = 8  # front/back frame padding (covers overlap-1 <= 7, sublane-aligned)


def _taps_conv_pair(Xre, Xim, taps, n_bins):
    """Hermitian P-tap conv along lanes on (rows, Fp) re/im pairs.

    Same math as the forward kernel's taps stage (ops/pallas/spectral.py)
    but returning the complex pair instead of the magnitude.
    """
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
        rp_re, rp_im = at(p)
        for k in range(p):
            sre, sim = at(2 * k - p)
            rp_re = jnp.where(lane == k, sre, rp_re)
            rp_im = jnp.where(lane == k, -sim, rp_im)
        lp_re, lp_im = at(-p)
        for i in range(p):
            sre, sim = at(p - 2 * i)
            lp_re = jnp.where(lane == N - i, sre, lp_re)
            lp_im = jnp.where(lane == N - i, -sim, lp_im)
        Yre = Yre + taps[p] * (rp_re + lp_re)
        Yim = Yim + taps[p] * (rp_im + lp_im)
    return Yre, Yim


def _twiddle_combine(Cre, Cim, twr_ref, twi_ref, overlap, out_rows, offset, conj):
    """``X[r] = sum_j tw_j . C[r + offset - j]`` (conj=True uses conj(tw)).

    ``C`` has more rows than ``X``; ``offset`` aligns the first output row.
    For the synthesis direction (conj=True) chunk c collects frames c-j;
    for analysis (conj=False) frame t collects chunks t+j — both are the
    same shifted-slice pattern with mirrored index signs, normalized here
    so callers pass the appropriate ``offset``.
    """
    Xre = Xim = None
    for j in range(overlap):
        start = offset + (-j if conj else j)
        cr = Cre[start: start + out_rows]
        ci = Cim[start: start + out_rows]
        twr = twr_ref[j, :][None, :]
        twi = twi_ref[j, :][None, :]
        if conj:
            re_j = twr * cr + twi * ci
            im_j = twr * ci - twi * cr
        else:
            re_j = twr * cr - twi * ci
            im_j = twr * ci + twi * cr
        Xre = re_j if Xre is None else Xre + re_j
        Xim = im_j if j == 0 else Xim + im_j
    return Xre, Xim


def _gl_kernel(
    mag_ref, are_ref, aim_ref, env_ref,
    cc_hi, cc_lo, cs_hi, cs_lo, ict_hi, ict_lo, ist_hi, ist_lo,
    twr_ref, twi_ref, wgt_ref,
    ore_ref, oim_ref,
    *, taps, overlap, tile_t, n_bins,
):
    f32 = jnp.float32
    W = tile_t + 2 * HALO  # input row window

    # synthesis: window the candidate spectrogram in the spectral domain
    Yre = mag_ref[0] * are_ref[0]
    Yim = mag_ref[0] * aim_ref[0]
    Yre, Yim = _taps_conv_pair(Yre, Yim, taps, n_bins)
    wgt = wgt_ref[0, :][None, :]  # hermitian inverse-DFT weights / n_fft
    Yre = Yre * wgt
    Yim = Yim * wgt

    # conj-twiddled accumulation into chunk rows wc in [HALO-? ..]:
    # D[wc] = sum_j conj(tw_j) Y[wc - j]; computed for wc in
    # [overlap-1, W) shifted so row r of D corresponds to wc = r + overlap - 1
    n_chunks = W - (overlap - 1)
    Dre, Dim = _twiddle_combine(
        Yre, Yim, twr_ref, twi_ref, overlap, n_chunks, overlap - 1, conj=True
    )

    def dot3(v, b_hi_ref, b_lo_ref):
        vh, vl = _split_bf16(v)
        return (
            jnp.dot(vh, b_hi_ref[...], preferred_element_type=f32)
            + jnp.dot(vh, b_lo_ref[...], preferred_element_type=f32)
            + jnp.dot(vl, b_hi_ref[...], preferred_element_type=f32)
        )

    # inverse chunk basis: samples = D_re @ Ch^T + D_im @ Sh^T, / envelope.
    # D row r is global chunk (tile_start + r + overlap-1 - HALO); the env
    # window rows share the frame-window offset, so env row = r + overlap-1.
    samples = dot3(Dre, ict_hi, ict_lo) + dot3(Dim, ist_hi, ist_lo)
    samples = samples / env_ref[0][overlap - 1: overlap - 1 + n_chunks]

    # analysis: chunk DFT -> twiddle combine -> taps conv
    Cre = dot3(samples, cc_hi, cc_lo)
    Cim = dot3(samples, cs_hi, cs_lo)
    # frame t (output row i, global frame t*tile+i) needs chunks t..t+3;
    # chunk row r of C is global chunk (window row r + overlap-1) - HALO
    # relative to the tile start, so output row i reads C rows
    # (i + HALO - (overlap-1)) + j
    Xre, Xim = _twiddle_combine(
        Cre, Cim, twr_ref, twi_ref, overlap, tile_t,
        HALO - (overlap - 1), conj=False,
    )
    Rre, Rim = _taps_conv_pair(Xre, Xim, taps, n_bins)
    ore_ref[0, :, :] = Rre
    oim_ref[0, :, :] = Rim


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "taps", "interpret", "tile_t"),
)
def _gl_call(
    magp, arep, aimp, envp, n_fft, hop_length, taps, interpret, tile_t
):
    B, rows_p, Fp = magp.shape
    overlap = n_fft // hop_length
    hop = hop_length
    n_tiles = (rows_p - 2 * HALO) // tile_t
    F = n_fft // 2 + 1

    Cc, Cs = _chunk_dft_matrices(n_fft, hop)
    CC = np.pad(Cc, [(0, 0), (0, Fp - F)])
    CS = np.pad(Cs, [(0, 0), (0, Fp - F)])
    # restricted inverse bases (hermitian weights live in wgt): Ch^T / Sh^T
    ICT = np.pad(Cc.T, [(0, Fp - F), (0, 0)])
    IST = np.pad(Cs.T, [(0, Fp - F), (0, 0)])
    twr, twi = _twiddles(n_fft, hop)
    rows_tw = max(8, _round_up(overlap, 8))
    TWR = np.pad(twr, [(0, rows_tw - overlap), (0, Fp - F)])
    TWI = np.pad(twi, [(0, rows_tw - overlap), (0, Fp - F)])
    wgt = np.full(F, 2.0, np.float32)
    wgt[0] = 1.0
    if n_fft % 2 == 0:
        wgt[-1] = 1.0
    WGT = np.pad(wgt / n_fft, (0, Fp - F))[None, :].repeat(8, 0)

    consts = [jnp.asarray(a) for a in (CC, CS, ICT, IST)]
    splits = []
    for a in consts:
        hi, lo = _split_bf16(a)
        splits += [hi, lo]

    kernel = functools.partial(
        _gl_kernel, taps=taps, overlap=overlap, tile_t=tile_t, n_bins=F,
    )

    def win3(last_dim):
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(tile_t + 2 * HALO), pl.Element(last_dim)),
            lambda b, t: (b, t * tile_t, 0),
            memory_space=pltpu.VMEM,
        )

    def fixed(m):
        return pl.BlockSpec(m.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM)

    in_specs = (
        [win3(Fp), win3(Fp), win3(Fp), win3(hop)]
        + [fixed(m) for m in splits]
        + [fixed(jnp.asarray(TWR)), fixed(jnp.asarray(TWI)), fixed(jnp.asarray(WGT))]
    )
    out_spec = pl.BlockSpec(
        (1, tile_t, Fp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )
    out_sd = jax.ShapeDtypeStruct((B, n_tiles * tile_t, Fp), jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(out_sd, out_sd),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        magp, arep, aimp, envp,
        *splits, jnp.asarray(TWR), jnp.asarray(TWI), jnp.asarray(WGT),
    )


def gl_project_available(n_fft: int, hop_length: int, taps) -> bool:
    return (
        taps is not None
        and n_fft % hop_length == 0
        and n_fft // hop_length <= HALO - 1
        and hop_length % LANE == 0
    )


def gl_project(
    mag: jnp.ndarray,
    ang_re: jnp.ndarray,
    ang_im: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    taps: Tuple[float, ...],
    window: jnp.ndarray,
    interpret: Optional[bool] = None,
    tile_t: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One Griffin-Lim consistency projection of ``mag * (ang_re + i ang_im)``.

    Inputs/outputs are frame-major ``(B, T, n_bins)`` real pairs.  See the
    module docstring for the boundary contract (OLA-tail edges instead of
    the trim + reflect-repad).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, F = mag.shape
    Fp = _round_up(F, LANE)
    if tile_t is None:
        tile_t = _pick_tile(T)
    n_tiles = -(-T // tile_t)
    rows_p = n_tiles * tile_t + 2 * HALO

    def padspec(a):
        return jnp.pad(
            a, [(0, 0), (HALO, rows_p - HALO - T), (0, Fp - F)]
        )

    magp, arep, aimp = padspec(mag), padspec(ang_re), padspec(ang_im)

    # exact OLA envelope of the squared synthesis window over the true T
    # frames, chunk-major, ones outside the signal (those rows are unused)
    # jnp (not numpy): `window` may be a traced pytree leaf (serving jits
    # invert with the transform as an argument)
    w2 = jnp.broadcast_to(
        jnp.asarray(window, jnp.float32)[None, :] ** 2, (T, n_fft)
    )
    env = overlap_add(w2, hop_length)  # ((T-1) hop + n_fft,)
    tiny = jnp.finfo(jnp.float32).tiny
    env = jnp.where(env > tiny, env, jnp.ones_like(env))
    n_chunks_sig = (T - 1) + n_fft // hop_length
    env_rows = env.reshape(n_chunks_sig, hop_length)
    envp = jnp.ones((rows_p, hop_length), jnp.float32)
    envp = jax.lax.dynamic_update_slice(envp, env_rows, (HALO, 0))
    envp = jnp.broadcast_to(envp[None], (B, rows_p, hop_length))

    ore, oim = _gl_call(
        magp, arep, aimp, envp, n_fft, hop_length, taps, interpret, tile_t
    )
    return ore[:, :T, :F], oim[:, :T, :F]
