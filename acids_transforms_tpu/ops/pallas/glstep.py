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


def _taps_conv_pair(Xre, Xim, taps, n_bins, xnyq=None):
    """Hermitian P-tap conv along lanes on (rows, Fp) re/im pairs.

    Same math as the forward kernel's taps stage (ops/pallas/spectral.py)
    but returning the complex pair instead of the magnitude.

    ``xnyq`` selects the nyquist-depadded layout: ``Xre``/``Xim`` hold
    lanes ``0..N-1`` only and the (real) nyquist channel rides in the
    ``xnyq`` column; returns ``(Yre, Yim, ynyq)``.  Same hermitian
    extension (``X[N+q] = conj(X[N-q])``); the only structural change is
    the padded conv's ``i = 0`` top-edge patch (the in-array nyquist lane)
    becoming the separate ``ynyq`` output, mirroring the forward kernel's
    ``_combine_taps_mag`` depad path (ops/pallas/spectral.py).
    """
    P = len(taps) - 1
    Fp = Xre.shape[-1]
    N = n_bins - 1
    depad = xnyq is not None
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
        for i in range(1 if depad else 0, p):
            sre, sim = at(p - 2 * i)
            lp_re = jnp.where(lane == N - i, sre, lp_re)
            lp_im = jnp.where(lane == N - i, -sim, lp_im)
        if depad:
            lp_re = jnp.where(lane == N - p, xnyq, lp_re)
            lp_im = jnp.where(lane == N - p, 0.0, lp_im)
        Yre = Yre + taps[p] * (rp_re + lp_re)
        Yim = Yim + taps[p] * (rp_im + lp_im)
    if not depad:
        return Yre, Yim
    ynyq = taps[0] * xnyq
    for p in range(1, P + 1):
        re_np = jnp.sum(
            jnp.where(lane == N - p, Xre, 0.0), axis=1, keepdims=True
        )
        ynyq = ynyq + (2.0 * taps[p]) * re_np
    return Yre, Yim, ynyq


def _taps_conv_pair_nyq(Xre, Xim, xnyq, taps, N):
    """Depadded-layout alias of :func:`_taps_conv_pair` (``N = n_bins - 1``
    is the virtual nyquist lane just past the array)."""
    return _taps_conv_pair(Xre, Xim, taps, N + 1, xnyq=xnyq)


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


def _stacked_dot3(re, im, basis_ref):
    """bf16x3 of [re | im] against a pre-stacked basis — ONE GEMM for
    what used to be six dots (r3 stacked-GEMM rework, see _chunk_dots)."""
    v = jnp.concatenate([re, im], axis=1)
    vh, vl = _split_bf16(v)
    stacked = jnp.concatenate([vh, vh, vl], axis=1)
    return jnp.dot(stacked, basis_ref[...], preferred_element_type=jnp.float32)


def _gl_project_vals(
    Yre, Yim, ynyq, mag_w, env, syn_basis_ref, ana_basis_ref, twr_ref,
    twi_ref, *, taps, overlap, n_bins, Fp, Fd, depad, out_rows, out_off_w,
    stages=5,
):
    """Consistency projection over VALUE arrays spanning one row window.

    ``Yre/Yim`` (+ ``ynyq`` column in the depadded layout) are the already
    taps-windowed ``mag * angles``; ``env`` the OLA envelope rows for the
    same window.  Returns ``(Rre, Rim)`` for ``out_rows`` frames starting
    at window row ``out_off_w`` — the projection consumes ``overlap - 1``
    context rows per side, so callers can ask for output windows of any
    width the input covers (the 2-iteration kernel asks for a wider first
    pass).  ``mag_w`` is only used for its row count.
    """
    f32 = jnp.float32
    N = n_bins - 1
    Wv = mag_w.shape[0]

    # conj-twiddled accumulation: D[wc] = sum_j conj(tw_j) Y[wc - j] for
    # wc in [overlap-1, Wv), so D row r is window chunk r + overlap - 1
    n_chunks = Wv - (overlap - 1)
    Dre, Dim = _twiddle_combine(
        Yre, Yim, twr_ref, twi_ref, overlap, n_chunks, overlap - 1, conj=True
    )

    # inverse chunk basis: samples = [D_re | D_im] @ [Ch^T ; Sh^T] (weights
    # folded in), / envelope
    samples = _stacked_dot3(Dre, Dim, syn_basis_ref)
    if depad:
        # nyquist's synthesis row is (-1)^r / n_fft (tw = +1, even hop):
        # combine + rank-1 add on the VPU, exact f32
        dnyq = None
        for j in range(overlap):
            start = overlap - 1 - j
            part = ynyq[start: start + n_chunks]
            dnyq = part if dnyq is None else dnyq + part
        r_i = jax.lax.broadcasted_iota(jnp.int32, samples.shape, 1)
        inv_alt = (1 - 2 * (r_i & 1)).astype(f32) * (1.0 / (overlap * samples.shape[1]))
        samples = samples + jnp.broadcast_to(dnyq, samples.shape) * inv_alt
    samples = samples / env[overlap - 1: overlap - 1 + n_chunks]
    if stages <= 2:  # floor-sweep prefix: synthesis GEMM + envelope only
        s = jnp.sum(samples)
        z = jnp.zeros((out_rows, Fp), jnp.float32) + s
        return z, z

    # analysis: chunk DFT -> twiddle combine -> taps conv
    sh, sl = _split_bf16(samples)
    Z = jnp.dot(
        jnp.concatenate([sh, sh, sl], axis=1), ana_basis_ref[...],
        preferred_element_type=f32,
    )
    Cre, Cim = Z[:, :Fd], Z[:, Fd:]
    # output row i (window frame out_off_w + i) reads C rows
    # (i + out_off_w - (overlap-1)) + j
    Xre, Xim = _twiddle_combine(
        Cre, Cim, twr_ref, twi_ref, overlap, out_rows,
        out_off_w - (overlap - 1), conj=False,
    )
    if stages <= 3:  # floor-sweep prefix: through the analysis GEMM
        # (sum marker, not a concat: Mosaic rejects the twiddle-combine's
        # sliced values feeding a pad/concat — "offset mismatch" rule)
        s = jnp.sum(Xre) + jnp.sum(Xim)
        return (
            jnp.zeros((out_rows, Fp), jnp.float32) + s,
            jnp.zeros((out_rows, Fp), jnp.float32) + s,
        )
    if depad:
        alt = (1 - 2 * (jax.lax.broadcasted_iota(
            jnp.int32, (1, samples.shape[1]), 1) & 1)).astype(f32)
        cnyq = jnp.sum(samples * alt, axis=1, keepdims=True)
        xnyq = None
        for j in range(overlap):
            start = out_off_w - (overlap - 1) + j
            part = cnyq[start: start + out_rows]
            xnyq = part if xnyq is None else xnyq + part
        Rre, Rim, rnyq = _taps_conv_pair_nyq(Xre, Xim, xnyq, taps, N)
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (out_rows, Fp - Fd), 1)
        rblk = jnp.where(lane0 == 0, jnp.broadcast_to(rnyq, lane0.shape), 0.0)
        return (
            jnp.concatenate([Rre, rblk], axis=1),
            jnp.concatenate([Rim, rblk * 0.0], axis=1),
        )
    return _taps_conv_pair(Xre, Xim, taps, n_bins)


def _gl_kernel(
    mag_ref, are_ref, aim_ref, env_ref,
    syn_basis_ref, ana_basis_ref,
    twr_ref, twi_ref,
    ore_ref, oim_ref,
    *, taps, overlap, tile_t, n_bins, stages=5,
):
    # stage prefixes (floor sweep, tools/sweep_gl_floor.py): 0 = DMA only
    # (copy in->out), 1 = + Y=mag*angles + synthesis taps conv, 2 = +
    # synthesis GEMM/envelope, 3 = + analysis GEMM/combine, >=4 = full
    # projection.  Default runs everything; the sweeps pass stages
    # explicitly to attribute the iteration time.
    if stages <= 0:
        ore_ref[0, :, :] = are_ref[0, HALO: HALO + tile_t, :]
        oim_ref[0, :, :] = aim_ref[0, HALO: HALO + tile_t, :]
        return
    # nyquist-depadded GEMM lanes (see ops/pallas/spectral.py module note):
    # the HBM state keeps the padded Fp layout (nyquist at lane N, zeros
    # above); only the two GEMMs and the twiddle combines run at Fd = N
    # lanes, with the nyquist channel threaded as an exact f32 column.
    # Ref slices (lane-aligned) happen HERE, before the value-level helpers
    # — Mosaic rejects value slices feeding later rolls/concats.
    Fp = mag_ref.shape[-1]
    Fd = twr_ref.shape[-1]
    depad = Fd == n_bins - 1 and Fd < Fp
    if depad:
        mag = mag_ref[0]
        Yre = mag_ref[0, :, :Fd] * are_ref[0, :, :Fd]
        Yim = mag_ref[0, :, :Fd] * aim_ref[0, :, :Fd]
        tail = mag_ref[0, :, Fd:] * are_ref[0, :, Fd:]
        lane0 = jax.lax.broadcasted_iota(jnp.int32, tail.shape, 1)
        ynyq_in = jnp.sum(
            jnp.where(lane0 == 0, tail, 0.0), axis=1, keepdims=True
        )
        Yre, Yim, ynyq = _taps_conv_pair_nyq(Yre, Yim, ynyq_in, taps, n_bins - 1)
    else:
        mag = mag_ref[0]
        Yre, Yim = _taps_conv_pair(mag * are_ref[0], mag * aim_ref[0], taps, n_bins)
        ynyq = None
    if stages <= 1:
        Fy = Yre.shape[-1]
        ore_ref[0, :, :Fy] = Yre[HALO: HALO + tile_t, :]
        oim_ref[0, :, :Fy] = Yim[HALO: HALO + tile_t, :]
        if Fy < Fp:
            z = jnp.zeros((tile_t, Fp - Fy), jnp.float32)
            ore_ref[0, :, Fy:] = z
            oim_ref[0, :, Fy:] = z
        return
    Rre, Rim = _gl_project_vals(
        Yre, Yim, ynyq, mag, env_ref[0], syn_basis_ref, ana_basis_ref,
        twr_ref, twi_ref, taps=taps, overlap=overlap, n_bins=n_bins,
        Fp=Fp, Fd=Fd, depad=depad, out_rows=tile_t, out_off_w=HALO,
        stages=stages,
    )
    ore_ref[0, :, :] = Rre
    oim_ref[0, :, :] = Rim


def _gl_kernel_momentum(
    mag_ref, are_ref, aim_ref, tre_ref, tim_ref, env_ref,
    syn_basis_ref, ana_basis_ref, twr_ref, twi_ref, mom_ref,
    nare_ref, naim_ref, rre_ref, rim_ref,
    *, taps, overlap, tile_t, n_bins, stages=5,
):
    """One full momentum-GL iteration in-kernel: the consistency projection
    (_gl_kernel) PLUS the momentum extrapolation and phase renormalization
    ``u = R - mom * tprev; angles = u / max(|u|, eps)`` — the elementwise
    update that otherwise costs ~6 XLA HBM passes over the (B, T, F)
    spectrogram per iteration (r3 measurement: ~35% of the loop)."""
    _gl_kernel(
        mag_ref, are_ref, aim_ref, env_ref,
        syn_basis_ref, ana_basis_ref, twr_ref, twi_ref,
        rre_ref, rim_ref,
        taps=taps, overlap=overlap, tile_t=tile_t, n_bins=n_bins,
        stages=stages,
    )
    if stages <= 4:  # floor-sweep prefix: projection without the update
        # (the tre/tim blocks are still DMA'd per their specs, so the
        # stage delta to the full kernel isolates the update arithmetic)
        nare_ref[0, :, :] = rre_ref[0, :, :]
        naim_ref[0, :, :] = rim_ref[0, :, :]
        return
    mom = mom_ref[0, 0]
    ure = rre_ref[0, :, :] - mom * tre_ref[0]
    uim = rim_ref[0, :, :] - mom * tim_ref[0]
    n = jnp.maximum(jnp.sqrt(ure * ure + uim * uim), 1e-16)
    nare_ref[0, :, :] = ure / n
    naim_ref[0, :, :] = uim / n


def _gl_kernel_momentum_chain(
    mag_ref, are_ref, aim_ref, tre_ref, tim_ref, env_ref,
    syn_basis_ref, ana_basis_ref, twr_ref, twi_ref, mom_ref,
    nare_ref, naim_ref, rre_ref, rim_ref,
    a1re_scr, a1im_scr,
    *, taps, overlap, tile_t, n_bins, halo, chain,
):
    """``chain`` momentum-GL iterations per invocation (r3.8/r3.9).

    Per-iteration HBM traffic (mag + 4 state arrays) and kernel dispatch
    are the non-compute share of the GL loop; running ``chain`` projections
    back to back divides both by ``chain``.  Each projection consumes
    ``m = overlap - 1`` rows per side, so iteration ``i`` (0-based) emits a
    window ``2 m (chain-1-i)`` rows wider than the output tile and the
    next iteration consumes it back down — the caller sizes the halo to
    ``chain * m``.  Interior rows equal ``chain`` chained single-step
    invocations bit-for-bit (suite-tested); signal edges keep the
    documented OLA-tail boundary.  ``tre``/``tim`` ride the windowed spec
    (iteration 0's momentum needs the wider rows).  Intermediate angles
    round-trip through VMEM scratch so the depadded lane slices stay REF
    slices (the Mosaic value-slice trap).
    """
    f32 = jnp.float32
    m = overlap - 1
    Fp = mag_ref.shape[-1]
    Fd = twr_ref.shape[-1]
    depad = Fd == n_bins - 1 and Fd < Fp
    mom = mom_ref[0, 0]

    def nyq_col(tail):
        lane0 = jax.lax.broadcasted_iota(jnp.int32, tail.shape, 1)
        return jnp.sum(jnp.where(lane0 == 0, tail, 0.0), axis=1, keepdims=True)

    Rre_prev = Rim_prev = None
    for i in range(chain):
        Wi = tile_t + 2 * m * (chain - 1 - i)       # this iteration's rows
        off = halo - m * (chain - 1 - i)            # their window offset
        lo, hi = off - m, off + Wi + m              # input rows consumed
        # Lane slices stay on REFS throughout (the Mosaic value-slice
        # trap); sublane (row) value slices are fine.
        if i == 0:
            src_re, src_im = are_ref, aim_ref
            if depad:
                Yre = mag_ref[0, lo:hi, :Fd] * src_re[0, lo:hi, :Fd]
                Yim = mag_ref[0, lo:hi, :Fd] * src_im[0, lo:hi, :Fd]
                ynyq = nyq_col(mag_ref[0, lo:hi, Fd:] * src_re[0, lo:hi, Fd:])
            else:
                Yre = mag_ref[0, lo:hi] * src_re[0, lo:hi]
                Yim = mag_ref[0, lo:hi] * src_im[0, lo:hi]
        else:
            Win = Wi + 2 * m  # previous iteration's output rows
            if depad:
                Yre = mag_ref[0, lo:hi, :Fd] * a1re_scr[:Win, :Fd]
                Yim = mag_ref[0, lo:hi, :Fd] * a1im_scr[:Win, :Fd]
                ynyq = nyq_col(mag_ref[0, lo:hi, Fd:] * a1re_scr[:Win, Fd:])
            else:
                Yre = mag_ref[0, lo:hi] * a1re_scr[:Win]
                Yim = mag_ref[0, lo:hi] * a1im_scr[:Win]
        if depad:
            Yre, Yim, ynyq = _taps_conv_pair_nyq(Yre, Yim, ynyq, taps, n_bins - 1)
        else:
            Yre, Yim = _taps_conv_pair(Yre, Yim, taps, n_bins)
            ynyq = None
        Rre, Rim = _gl_project_vals(
            Yre, Yim, ynyq, Yre, env_ref[0][lo:hi], syn_basis_ref,
            ana_basis_ref, twr_ref, twi_ref, taps=taps, overlap=overlap,
            n_bins=n_bins, Fp=Fp, Fd=Fd, depad=depad, out_rows=Wi,
            out_off_w=m,
        )
        if i == 0:
            ure = Rre - mom * tre_ref[0][off: off + Wi]
            uim = Rim - mom * tim_ref[0][off: off + Wi]
        else:
            ure = Rre - mom * Rre_prev[m: m + Wi]
            uim = Rim - mom * Rim_prev[m: m + Wi]
        n = jnp.maximum(jnp.sqrt(ure * ure + uim * uim), 1e-16)
        if i < chain - 1:
            a1re_scr[:Wi] = ure / n
            a1im_scr[:Wi] = uim / n
            Rre_prev, Rim_prev = Rre, Rim
        else:
            rre_ref[0, :, :] = Rre
            rim_ref[0, :, :] = Rim
            nare_ref[0, :, :] = ure / n
            naim_ref[0, :, :] = uim / n


def _gl_specs(tile_t, Fp, B, n_tiles, halo=HALO):
    """Shared block-spec builders for the GL kernel entries: the windowed
    input spec (tile + 2*halo rows), the fixed whole-operand spec, and the
    output spec/shape pair."""
    def win3(last_dim):
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(tile_t + 2 * halo), pl.Element(last_dim)),
            lambda b, t: (b, t * tile_t, 0),
            memory_space=pltpu.VMEM,
        )

    def fixed(m):
        return pl.BlockSpec(m.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec(
        (1, tile_t, Fp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )
    out_sd = jax.ShapeDtypeStruct((B, n_tiles * tile_t, Fp), jnp.float32)
    return win3, fixed, out_spec, out_sd


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "taps", "interpret", "tile_t", "chain",
        "halo", "stages",
    ),
)
def _gl_call(
    magp, arep, aimp, envp, n_fft, hop_length, taps, interpret, tile_t,
    trep=None, timp=None, mom=None, chain=1, halo=HALO, stages=5,
):
    B, rows_p, Fp = magp.shape
    overlap = n_fft // hop_length
    hop = hop_length
    n_tiles = (rows_p - 2 * halo) // tile_t
    F = n_fft // 2 + 1

    from .spectral import _nyq_depad

    Cc, Cs = _chunk_dft_matrices(n_fft, hop)
    # restricted inverse bases with the hermitian weights / n_fft folded
    # into their rows: Ch^T / Sh^T
    wgt = np.full(F, 2.0, np.float32)
    wgt[0] = 1.0
    if n_fft % 2 == 0:
        wgt[-1] = 1.0
    wgt = (wgt / n_fft)[:, None]
    twr, twi = _twiddles(n_fft, hop)
    rows_tw = max(8, _round_up(overlap, 8))
    if _nyq_depad(n_fft, hop):
        # GEMMs/combines at exactly F-1 lanes; the nyquist channel rides
        # as an exact f32 column inside the kernel (HBM layout unchanged)
        Fd = F - 1
        CC, CS = Cc[:, :Fd], Cs[:, :Fd]
        ICT = (Cc.T * wgt)[:Fd]
        IST = (Cs.T * wgt)[:Fd]
        TWR = np.pad(twr[:, :Fd], [(0, rows_tw - overlap), (0, 0)])
        TWI = np.pad(twi[:, :Fd], [(0, rows_tw - overlap), (0, 0)])
    else:
        CC = np.pad(Cc, [(0, 0), (0, Fp - F)])
        CS = np.pad(Cs, [(0, 0), (0, Fp - F)])
        ICT = np.pad(Cc.T * wgt, [(0, Fp - F), (0, 0)])
        IST = np.pad(Cs.T * wgt, [(0, Fp - F), (0, 0)])
        TWR = np.pad(twr, [(0, rows_tw - overlap), (0, Fp - F)])
        TWI = np.pad(twi, [(0, rows_tw - overlap), (0, Fp - F)])

    # pre-stacked bf16x3 operands (r3): synthesis contracts [Dre | Dim]
    # against [ICT; IST], analysis produces [Cre | Cim] from [CC | CS]
    ict_hi, ict_lo = _split_bf16(jnp.asarray(ICT))
    ist_hi, ist_lo = _split_bf16(jnp.asarray(IST))
    syn_top = jnp.concatenate([ict_hi, ist_hi], axis=0)
    syn_mid = jnp.concatenate([ict_lo, ist_lo], axis=0)
    syn_basis = jnp.concatenate([syn_top, syn_mid, syn_top], axis=0)
    cc_hi, cc_lo = _split_bf16(jnp.asarray(CC))
    cs_hi, cs_lo = _split_bf16(jnp.asarray(CS))
    ana_top = jnp.concatenate([cc_hi, cs_hi], axis=1)
    ana_mid = jnp.concatenate([cc_lo, cs_lo], axis=1)
    ana_basis = jnp.concatenate([ana_top, ana_mid, ana_top], axis=0)

    momentum = trep is not None
    win3, fixed, out_spec, out_sd = _gl_specs(tile_t, Fp, B, n_tiles, halo)
    common = dict(
        grid=(B, n_tiles),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    if momentum:
        if chain >= 2:
            # `chain` iterations per invocation (r3.8/r3.9): tre/tim ride
            # the windowed spec (iteration 0's momentum needs the wider
            # rows); the intermediate angles live in VMEM scratch
            m = overlap - 1
            kernel = functools.partial(
                _gl_kernel_momentum_chain, taps=taps, overlap=overlap,
                tile_t=tile_t, n_bins=F, halo=halo, chain=chain,
            )
            scr_rows = tile_t + 2 * m * (chain - 1)
            return pl.pallas_call(
                kernel,
                in_specs=[win3(Fp), win3(Fp), win3(Fp), win3(Fp), win3(Fp),
                          win3(hop), fixed(syn_basis), fixed(ana_basis),
                          fixed(jnp.asarray(TWR)), fixed(jnp.asarray(TWI)),
                          pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                                       memory_space=pltpu.SMEM)],
                out_specs=(out_spec,) * 4,
                out_shape=(out_sd,) * 4,
                scratch_shapes=[
                    pltpu.VMEM((scr_rows, Fp), jnp.float32),
                    pltpu.VMEM((scr_rows, Fp), jnp.float32),
                ],
                **common,
            )(
                magp, arep, aimp, trep, timp, envp,
                syn_basis, ana_basis, jnp.asarray(TWR), jnp.asarray(TWI),
                jnp.asarray(mom, jnp.float32).reshape(1, 1),
            )
        kernel = functools.partial(
            _gl_kernel_momentum, taps=taps, overlap=overlap, tile_t=tile_t,
            n_bins=F, stages=stages,
        )
        return pl.pallas_call(
            kernel,
            in_specs=[win3(Fp), win3(Fp), win3(Fp), out_spec, out_spec,
                      win3(hop), fixed(syn_basis), fixed(ana_basis),
                      fixed(jnp.asarray(TWR)), fixed(jnp.asarray(TWI)),
                      pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=(out_spec,) * 4,
            out_shape=(out_sd,) * 4,
            **common,
        )(
            magp, arep, aimp, trep, timp, envp,
            syn_basis, ana_basis, jnp.asarray(TWR), jnp.asarray(TWI),
            jnp.asarray(mom, jnp.float32).reshape(1, 1),
        )

    kernel = functools.partial(
        _gl_kernel, taps=taps, overlap=overlap, tile_t=tile_t, n_bins=F,
    )
    return pl.pallas_call(
        kernel,
        in_specs=[win3(Fp), win3(Fp), win3(Fp), win3(hop)]
        + [fixed(syn_basis), fixed(ana_basis)]
        + [fixed(jnp.asarray(TWR)), fixed(jnp.asarray(TWI))],
        out_specs=(out_spec, out_spec),
        out_shape=(out_sd, out_sd),
        **common,
    )(
        magp, arep, aimp, envp,
        syn_basis, ana_basis, jnp.asarray(TWR), jnp.asarray(TWI),
    )


def _gl_kernel_fullk_momentum(
    mag_ref, are_ref, aim_ref, tre_ref, tim_ref, env_ref,
    syn_basis_ref, ana_basis_ref, mom_ref,
    nare_ref, naim_ref, rre_ref, rim_ref,
    *, overlap, tile_t, hop,
):
    """Full-K momentum-GL iteration for ARBITRARY windows (the DGT gaussian).

    Same structure as the factored `_gl_kernel_momentum` but with the
    window folded into full-K iDFT/DFT bases and the OLA done on explicit
    synthesis frames: spec -> frames (one stacked GEMM) -> overlap-add ->
    envelope divide -> re-frame -> DFT (one stacked GEMM) -> momentum +
    renormalize.  Boundary contract identical to the factored kernel
    (OLA-tail edges; GL parity is spectral convergence).
    """
    f32 = jnp.float32
    W = tile_t + 2 * HALO
    Fp = mag_ref.shape[-1]
    n_fft = overlap * hop

    Yre = mag_ref[0] * are_ref[0]
    Yim = mag_ref[0] * aim_ref[0]
    flat = jnp.concatenate([Yre, Yim], axis=1)          # (W, 2 Fp)
    h, l = _split_bf16(flat)
    stk = jnp.concatenate([h, h, l], axis=1)
    td = jnp.dot(stk, syn_basis_ref[...], preferred_element_type=f32)
    td = td.reshape(W, overlap, hop)

    # OLA rows: chunk row r = sum_j td[r - j, j]; rows [ov-1, W) are fully
    # summed (their frames all lie inside the halo window)
    acc = jnp.zeros((W + overlap - 1, hop), f32)
    for j in range(overlap):
        acc = acc + jnp.pad(td[:, j, :], [(j, overlap - 1 - j), (0, 0)])
    n_chunks = W - (overlap - 1)
    samples = acc[overlap - 1: overlap - 1 + n_chunks]
    samples = samples / env_ref[0][overlap - 1: overlap - 1 + n_chunks]

    # re-frame: output frame i (window row H + i) covers sample rows
    # (i + HALO - (overlap - 1)) + j.  Roll-then-slice on an 8-aligned pad
    # (Mosaic cannot concat operands with different sublane offsets).
    base = HALO - (overlap - 1)
    pad_rows = -(-n_chunks // 8) * 8 - n_chunks
    sp = jnp.pad(samples, [(0, pad_rows), (0, 0)])
    n_sp = sp.shape[0]
    parts = [
        pltpu.roll(sp, shift=(n_sp - (base + j)) % n_sp, axis=0)[:tile_t, :]
        for j in range(overlap)
    ]
    frames = jnp.concatenate(parts, axis=1)             # (tile_t, n_fft)
    fh, fl = _split_bf16(frames)
    fstk = jnp.concatenate([fh, fh, fl], axis=1)
    Z = jnp.dot(fstk, ana_basis_ref[...], preferred_element_type=f32)
    Rre, Rim = Z[:, :Fp], Z[:, Fp:]
    rre_ref[0, :, :] = Rre
    rim_ref[0, :, :] = Rim

    mom = mom_ref[0, 0]
    ure = Rre - mom * tre_ref[0]
    uim = Rim - mom * tim_ref[0]
    n = jnp.maximum(jnp.sqrt(ure * ure + uim * uim), 1e-16)
    nare_ref[0, :, :] = ure / n
    naim_ref[0, :, :] = uim / n


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "interpret", "tile_t"),
)
def _gl_fullk_call(
    magp, arep, aimp, trep, timp, envp, syn_basis, ana_basis, mom,
    n_fft, hop_length, interpret, tile_t,
):
    B, rows_p, Fp = magp.shape
    overlap = n_fft // hop_length
    n_tiles = (rows_p - 2 * HALO) // tile_t

    kernel = functools.partial(
        _gl_kernel_fullk_momentum,
        overlap=overlap, tile_t=tile_t, hop=hop_length,
    )

    win3, fixed, out_spec, out_sd = _gl_specs(tile_t, Fp, B, n_tiles)
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[win3(Fp), win3(Fp), win3(Fp), out_spec, out_spec,
                  win3(hop_length), fixed(syn_basis), fixed(ana_basis),
                  pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(out_spec,) * 4,
        out_shape=(out_sd,) * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(magp, arep, aimp, trep, timp, envp, syn_basis, ana_basis,
      jnp.asarray(mom, jnp.float32).reshape(1, 1))


def gl_fullk_available(n_fft: int, hop_length: int) -> bool:
    return (
        n_fft % hop_length == 0
        and 2 <= n_fft // hop_length <= HALO
        and hop_length % LANE == 0
    )


def make_gl_momentum_step_fullk(
    mag: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    momentum: float,
    interpret: Optional[bool] = None,
    tile_t: Optional[int] = None,
):
    """Full-K variant of :func:`make_gl_momentum_step` for windows without
    cosine-sum taps (the DGT gaussian / its scaled dual).  Same contract."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, F = mag.shape
    Fp = _round_up(F, LANE)
    if tile_t is None:
        tile_t = _pick_tile(T)
    n_tiles = -(-T // tile_t)
    rows_p = n_tiles * tile_t + 2 * HALO
    rows_out = n_tiles * tile_t

    magp = jnp.pad(mag, [(0, 0), (HALO, rows_p - HALO - T), (0, Fp - F)])
    envp = _env_rows(mag, n_fft, hop_length, window, rows_p, B)

    from ..fft import _dft_matrices, _idft_matrices

    w_col = jnp.asarray(window, jnp.float32)
    # synthesis: [re | im] (2 Fp) -> samples, hermitian weights + window in
    A, Bm = _idft_matrices(n_fft)
    AB = jnp.concatenate(
        [
            jnp.pad(jnp.asarray(A), [(0, Fp - F), (0, 0)]),
            jnp.pad(jnp.asarray(Bm), [(0, Fp - F), (0, 0)]),
        ],
        axis=0,
    ) * w_col[None, :]
    hi, lo = _split_bf16(AB)
    syn_basis = jnp.concatenate([hi, lo, hi], axis=0)   # (6 Fp, n_fft)
    # analysis: frames -> [re | im], window folded into rows
    C_np, S_np = _dft_matrices(n_fft)
    WCS = jnp.concatenate(
        [
            jnp.pad(jnp.asarray(C_np), [(0, 0), (0, Fp - F)]),
            jnp.pad(jnp.asarray(S_np), [(0, 0), (0, Fp - F)]),
        ],
        axis=1,
    ) * w_col[:, None]
    ah, al = _split_bf16(WCS)
    ana_basis = jnp.concatenate([ah, al, ah], axis=0)   # (3 n_fft, 2 Fp)

    def to_rows(a):
        return jnp.pad(a, [(0, 0), (0, rows_out - T), (0, Fp - F)])

    def from_rows(a):
        return a[:, :T, :F]

    def step(are_r, aim_r, tre_r, tim_r):
        pads = [(0, 0), (HALO, rows_p - HALO - rows_out), (0, 0)]
        return _gl_fullk_call(
            magp, jnp.pad(are_r, pads), jnp.pad(aim_r, pads), tre_r, tim_r,
            envp, syn_basis, ana_basis, float(momentum),
            n_fft, hop_length, interpret, tile_t,
        )

    return step, to_rows, from_rows


def make_gl_momentum_step(
    mag: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    taps: Tuple[float, ...],
    window: jnp.ndarray,
    momentum: float,
    interpret: Optional[bool] = None,
    tile_t: Optional[int] = None,
    iters: int = 1,
    stages: int = 5,
):
    """Whole-iteration momentum-GL step factory (r3).

    Returns ``(step, to_rows, from_rows)``: ``step(are, aim, tre, tim) ->
    (nare, naim, rre, rim)`` runs one full GL iteration — consistency
    projection + momentum extrapolation + renormalization — in ONE kernel
    invocation, with all four arrays in the padded row layout
    ``(B, n_tiles*tile_t, Fp)`` (``to_rows``/``from_rows`` convert).  The
    magnitude and envelope operands are baked in here, outside the loop.

    ``iters=k`` (r3.8/r3.9) runs k chained iterations per invocation:
    interior rows equal k single steps exactly, per-iteration HBM traffic
    and dispatch divide by k.  The halo grows to cover the k stacked
    receptive fields (``k * (overlap-1)`` rows, 4-row aligned), so very
    large ``k * overlap`` trades extra per-tile input fetch for the saved
    invocations — measured optimum at the bench shape is k=2-4.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, F = mag.shape
    Fp = _round_up(F, LANE)
    if tile_t is None:
        tile_t = _pick_tile(T)
    n_tiles = -(-T // tile_t)
    overlap = n_fft // hop_length
    halo = HALO
    if iters >= 2:
        # the k stacked receptive fields need k*m context rows; keep the
        # window row count 8-aligned (tile_t is) via a 4-aligned halo
        halo = max(HALO, -(-(iters * (overlap - 1)) // 4) * 4)
    rows_p = n_tiles * tile_t + 2 * halo
    rows_out = n_tiles * tile_t

    magp = jnp.pad(mag, [(0, 0), (halo, rows_p - halo - T), (0, Fp - F)])
    envp = _env_rows(mag, n_fft, hop_length, window, rows_p, B, halo)

    def to_rows(a):
        return jnp.pad(a, [(0, 0), (0, rows_out - T), (0, Fp - F)])

    def from_rows(a):
        return a[:, :T, :F]

    if iters >= 2:
        def step(are_r, aim_r, tre_r, tim_r):
            pads = [(0, 0), (halo, rows_p - halo - rows_out), (0, 0)]
            return _gl_call(
                magp, jnp.pad(are_r, pads), jnp.pad(aim_r, pads), envp,
                n_fft, hop_length, taps, interpret, tile_t,
                trep=jnp.pad(tre_r, pads), timp=jnp.pad(tim_r, pads),
                mom=float(momentum), chain=iters, halo=halo,
            )

        return step, to_rows, from_rows

    def step(are_r, aim_r, tre_r, tim_r):
        pads = [(0, 0), (HALO, rows_p - HALO - rows_out), (0, 0)]
        return _gl_call(
            magp, jnp.pad(are_r, pads), jnp.pad(aim_r, pads), envp,
            n_fft, hop_length, taps, interpret, tile_t,
            trep=tre_r, timp=tim_r, mom=float(momentum), stages=stages,
        )

    return step, to_rows, from_rows


def _env_rows(mag, n_fft, hop_length, window, rows_p, B, halo=HALO):
    """Chunk-major OLA envelope rows shared by both kernel entries."""
    T = mag.shape[1]
    w2 = jnp.broadcast_to(
        jnp.asarray(window, jnp.float32)[None, :] ** 2, (T, n_fft)
    )
    env = overlap_add(w2, hop_length)
    tiny = jnp.finfo(jnp.float32).tiny
    env = jnp.where(env > tiny, env, jnp.ones_like(env))
    n_chunks_sig = (T - 1) + n_fft // hop_length
    env_rows = env.reshape(n_chunks_sig, hop_length)
    envp = jnp.ones((rows_p, hop_length), jnp.float32)
    envp = jax.lax.dynamic_update_slice(envp, env_rows, (halo, 0))
    return jnp.broadcast_to(envp[None], (B, rows_p, hop_length))


def gl_project_available(n_fft: int, hop_length: int, taps) -> bool:
    return (
        taps is not None
        and n_fft % hop_length == 0
        and n_fft // hop_length <= HALO
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
    # frames, chunk-major, ones outside the signal (those rows are unused);
    # jnp (not numpy): `window` may be a traced pytree leaf (serving jits
    # invert with the transform as an argument)
    envp = _env_rows(mag, n_fft, hop_length, window, rows_p, B)

    ore, oim = _gl_call(
        magp, arep, aimp, envp, n_fft, hop_length, taps, interpret, tile_t
    )
    return ore[:, :T, :F], oim[:, :T, :F]
