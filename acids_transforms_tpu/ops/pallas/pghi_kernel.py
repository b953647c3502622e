"""Fused PGHI inversion kernel: magnitude -> audio in ONE Pallas pass.

The XLA formulation of offline PGHI inversion (ops/pghi.py pghi_scan +
ops/fft.py istft) is dispatch/HBM-bound, not compute-bound (r3 decomposition,
tools/sweep_pghi.py at the bench shape, batch 8 x 690 frames):

    gradients + anchor precompute     1.48 ms   (~30 elementwise HBM passes)
    sqrt-blocked time recurrence      3.0 ms    (deep associative_scan chains,
                                                 each stage a tiny dispatched op)
    mag*e^{i phi} -> ISTFT            1.8 ms    (1.3 ms of it the transcendental
                                                 + complex HBM passes alone)

All three collapse into this kernel: the grid walks frame tiles
SEQUENTIALLY ('arbitrary'), per-frame state (previous phase, previous
time-gradient, the OLA tail) lives in VMEM scratch that persists across grid
steps, and every intermediate — log-magnitudes, gradient fields, anchor
masks, the segmented-scan fill, sin/cos, the windowed iDFT frames, the
overlap-add — stays in VMEM.  The serial time dependency that forced the
sqrt-blocked schedule in XLA (per-frame dispatch ~26 us) is free here
(per-frame cost ~2 us of VPU work).

Semantics match ops/pghi.py's serial scan (same anchors, same trapezoids,
same onset seeding and random silent phase) followed by the least-squares
ISTFT — the envelope division and centre trim run outside on the small audio
tensor.  Random silent-bin phases stream in as an input (generated outside;
tests pin them to the scan's draw for exact comparison).

Reference: acids_transforms/transforms/dgt.py:156-236 (offline PGHI),
dgt.py:85-93 (ISTFT inversion); redesigned TPU-first (no heap, no gathers).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fft import _idft_matrices
from .spectral import LANE, _round_up, _split_bf16

__all__ = ["pghi_invert_fused", "pghi_phases_fused", "pghi_fused_available"]


def pghi_fused_available(n_fft: int, hop_length: int) -> bool:
    # hop % 128: the synthesis reshape (B*tile_f, overlap*hop) ->
    # (B, tile_f, overlap, hop) needs lane-aligned hop on TPU (Mosaic
    # "unsupported shape cast" otherwise); smaller hops fall back to the
    # sqrt-blocked XLA path
    return (
        n_fft % hop_length == 0
        and n_fft // hop_length >= 2
        and hop_length % LANE == 0
    )


def _seg_scan(a, b, d, Fp, reverse):
    """In-kernel Hillis-Steele prefix composition of affine maps along lanes.

    Each lane is the map ``x -> a*x + b`` (a=0 at anchors resets the chain);
    ``d`` rides as a second affine channel (the anchor-distance counter).
    Returns the composed ``(a, b, d)`` — ``b`` is the propagated value from
    the nearest anchor (applied to x0 = 0), ``a == 0`` iff an anchor exists
    in this lane's direction.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    s = 1
    while s < Fp:
        if reverse:
            edge = lane < (Fp - s)
            sh = -s
        else:
            edge = lane >= s
            sh = s
        a_p = jnp.where(edge, pltpu.roll(a, shift=sh % Fp, axis=a.ndim - 1), 1.0)
        b_p = jnp.where(edge, pltpu.roll(b, shift=sh % Fp, axis=a.ndim - 1), 0.0)
        d_p = jnp.where(edge, pltpu.roll(d, shift=sh % Fp, axis=a.ndim - 1), 0.0)
        # compose: earlier map (k -/+ s) then this one
        b = b_p * a + b
        d = d_p * a + d
        a = a_p * a
        s *= 2
    return a, b, d


def _pghi_invert_kernel(
    mag_ref, abstol_ref, angles_ref, basis_ref, o_ref,
    phi_ref, tail_ref, reim_ref, ct_ref, sup_ref, sdn_ref, anc_ref, sig_ref,
    *, tile_f, n_bins, Fp, n_fft, hop, overlap, T_real, fmul, eps,
    emit_phases=False,
):
    """One grid step: ``tile_f`` frames of fill + synthesis (see module docs).

    ``mag_ref`` block rows r = 0..tile_f+1 hold padded frames
    ``g0 - 1 .. g0 + tile_f`` (g0 = tile * tile_f): each frame's central
    time stencil reads its neighbours directly.
    """
    tile = pl.program_id(0)
    B = mag_ref.shape[0]
    f32 = jnp.float32

    @pl.when(tile == 0)
    def _init():
        phi_ref[...] = jnp.zeros((B, Fp), f32)
        tail_ref[...] = jnp.zeros_like(tail_ref)

    abstol = abstol_ref[...]  # (B, Fp) broadcast rows

    # ---- tile-level precompute (r3.5): everything except the serial phase
    # carry vectorizes over the tile's frames — the loop below keeps only the
    # trapezoid add, the two segmented scans and the selects.  The previous
    # per-frame formulation recomputed log-magnitudes 3x per frame and ran
    # the derivative/anchor/trig work one (B, Fp) row at a time; this block
    # is ~2/3 of what made each serial step expensive.  The ts carry is gone
    # entirely: block row 0 is the previous tile's last frame (frame -1 is
    # all-zero => log(eps), dY_dk = 0, carrier-only — the old _init value).
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (B, tile_f + 2, Fp), 2)
    ck3 = (2.0 * np.pi * hop / n_fft) * lane3.astype(f32)
    M = mag_ref[...][:, : tile_f + 2, :]           # frames g0-1 .. g0+tile_f
    Y = jnp.log(jnp.maximum(M, eps))               # ONE log per frame row
    # freq derivative of log-mag (central, replicate edges, valid lanes)
    Y_dn = jnp.where(lane3 == 0, Y, pltpu.roll(Y, shift=1, axis=2))
    Y_up = jnp.where(
        lane3 == n_bins - 1, Y, pltpu.roll(Y, shift=Fp - 1, axis=2)
    )
    ts_all = ((Y_up - Y_dn) / 2.0) / fmul + ck3    # (B, tile_f+2, Fp)
    # time trapezoid: mean of the previous and current frame's ts
    ct_ref[...] = (ts_all[:, :tile_f, :] + ts_all[:, 1: tile_f + 1, :]) / 2.0
    # time derivative (central; the +1 halo row is the edge-replicate)
    fs = -fmul * ((Y[:, 2:, :] - Y[:, :-2, :]) / 2.0) + np.pi
    # NEVER slice a broadcasted_iota: Mosaic keeps iotas replicated (one
    # sublane) and slicing the sublane dim hits a layout CHECK; build them
    # at the exact shape instead
    lanec = jax.lax.broadcasted_iota(jnp.int32, (B, tile_f, Fp), 2)
    in_binsc = lanec < n_bins
    # frequency-fill trapezoid steps, both directions
    sup_ref[...] = jnp.where(
        lanec == 0, 0.0, (fs + pltpu.roll(fs, shift=1, axis=2)) / 2.0
    )
    sdn_ref[...] = jnp.where(
        lanec == n_bins - 1, 0.0,
        -(fs + pltpu.roll(fs, shift=Fp - 1, axis=2)) / 2.0,
    )
    Mc = M[:, 1: tile_f + 1, :]
    # sublane-dim broadcasts must be explicit for Mosaic (lane-dim keepdims
    # broadcasts below are fine)
    absb = jnp.broadcast_to(abstol[:, None, :], (B, tile_f, Fp))
    sig = (Mc > absb) & in_binsc
    prev_sig = (M[:, :tile_f, :] > absb) & in_binsc
    # freq-ridge peaks (edges compare against -1, i.e. always pass)
    m_dn = jnp.where(lanec == 0, -1.0, pltpu.roll(Mc, shift=1, axis=2))
    m_up = jnp.where(
        lanec == n_bins - 1, -1.0, pltpu.roll(Mc, shift=Fp - 1, axis=2)
    )
    anchored = sig & prev_sig & (Mc >= m_dn) & (Mc >= m_up)
    no_anchor = ~jnp.any(anchored, axis=-1, keepdims=True)
    m_masked = jnp.where(in_binsc, Mc, -1.0)
    is_gmax = m_masked == jnp.max(m_masked, axis=-1, keepdims=True)
    anchored = anchored | (no_anchor & sig & is_gmax)
    anc_ref[...] = anchored.astype(f32)
    # fold the silent-bin fallback into one field: sig bins keep a sentinel
    # (resolved in-loop), silent bins carry their random phase
    sig_ref[...] = sig.astype(f32)

    def frame_step(t, _):
        anc_f = anc_ref[:, t, :]
        anchored = anc_f > 0.5

        # anchored bins: time trapezoid from the previous frame's phase
        phi_t = phi_ref[...] + ct_ref[:, t, :]

        a0 = 1.0 - anc_f
        b_up = jnp.where(anchored, phi_t, sup_ref[:, t, :])
        b_dn = jnp.where(anchored, phi_t, sdn_ref[:, t, :])
        d0 = a0  # 0 at anchors, 1 elsewhere
        a_u, f_up, d_up = _seg_scan(a0, b_up, d0, Fp, reverse=False)
        a_d, f_dn, d_dn = _seg_scan(a0, b_dn, d0, Fp, reverse=True)
        big = jnp.float32(10 * Fp)
        du = jnp.where(a_u == 0, d_up, big)
        dd = jnp.where(a_d == 0, d_dn, big)
        filled = jnp.where(du <= dd, f_up, f_dn)
        any_anchor = jnp.any(anchored, axis=-1, keepdims=True)
        filled = jnp.where(any_anchor, filled, 0.0)

        phi = jnp.where(anchored, phi_t, filled)
        phi = jnp.where(sig_ref[:, t, :] > 0.5, phi, angles_ref[:, t, :])

        phi_ref[...] = phi
        # trig + magnitude application vectorize after the loop
        reim_ref[:, pl.ds(t, 1), :Fp] = phi[:, None, :]
        return 0

    jax.lax.fori_loop(0, tile_f, frame_step, 0, unroll=False)
    if emit_phases:
        o_ref[...] = reim_ref[...][:, :, :Fp]
        return

    # synthesis operands (zero outside real frames/bins), whole-tile trig
    row3 = jax.lax.broadcasted_iota(jnp.int32, (B, tile_f, Fp), 1)
    valid = (tile * tile_f + row3) < T_real
    mm = jnp.where(in_binsc & valid, Mc, 0.0)
    phis = reim_ref[...][:, :, :Fp]
    reim_ref[...] = jnp.concatenate(
        [mm * jnp.cos(phis), mm * jnp.sin(phis)], axis=2
    )

    # ---- synthesis: windowed iDFT of the tile's frames + overlap-add
    flat = reim_ref[...].reshape(B * tile_f, 2 * Fp)
    hi, lo = _split_bf16(flat)
    stacked = jnp.concatenate([hi, hi, lo], axis=1)  # (B*tile_f, 6 Fp)
    td = jnp.dot(stacked, basis_ref[...], preferred_element_type=f32)
    td = td.reshape(B, tile_f, overlap, hop)

    rows = jnp.zeros((B, tile_f + overlap - 1, hop), f32)
    for j in range(overlap):
        rows = rows + jnp.pad(
            td[:, :, j, :], [(0, 0), (j, overlap - 1 - j), (0, 0)]
        )
    # (no scatter in Mosaic: add the carried tail via a zero-padded concat)
    rows = rows + jnp.concatenate(
        [tail_ref[...], jnp.zeros((B, tile_f, hop), f32)], axis=1
    )
    tail_ref[...] = rows[:, tile_f:, :]
    o_ref[...] = rows[:, :tile_f, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "tile_f", "interpret", "T_real", "fmul",
        "emit_phases",
    ),
)
def _fused_call(
    mag_p, abstol_rows, angles, basis, n_fft, hop_length, tile_f, interpret,
    T_real, fmul, emit_phases=False,
):
    B, n_rows, Fp = mag_p.shape
    overlap = n_fft // hop_length
    n_tiles = (n_rows - 8) // tile_f
    n_bins = n_fft // 2 + 1
    eps = 1.19e-7
    out_w = Fp if emit_phases else hop_length

    kernel = functools.partial(
        _pghi_invert_kernel,
        tile_f=tile_f, n_bins=n_bins, Fp=Fp, n_fft=n_fft, hop=hop_length,
        overlap=overlap, T_real=T_real, fmul=float(fmul), eps=eps,
        emit_phases=emit_phases,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            # 8-row halo (2 used) keeps the Element block sublane-aligned
            pl.BlockSpec(
                (pl.Element(B), pl.Element(tile_f + 8), pl.Element(Fp)),
                lambda t: (0, t * tile_f, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((B, Fp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (B, tile_f, Fp), lambda t: (0, t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(basis.shape, lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, tile_f, out_w), lambda t: (0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_tiles * tile_f, out_w), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((B, Fp), jnp.float32),                # phi carry
            pltpu.VMEM((B, overlap - 1, hop_length), jnp.float32),  # OLA tail
            pltpu.VMEM((B, tile_f, 2 * Fp), jnp.float32),    # re | im
            pltpu.VMEM((B, tile_f, Fp), jnp.float32),        # c_t (trapezoid)
            pltpu.VMEM((B, tile_f, Fp), jnp.float32),        # step_up
            pltpu.VMEM((B, tile_f, Fp), jnp.float32),        # step_dn
            pltpu.VMEM((B, tile_f, Fp), jnp.float32),        # anchored mask
            pltpu.VMEM((B, tile_f, Fp), jnp.float32),        # significant mask
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mag_p, abstol_rows, angles, basis)
    return out


def _prep_mag(mag, n_fft, hop_length, tolerance, tile_f, key, angles):
    """Shared padded-frame layout + abstol rows + silent-bin angles."""
    T, F = mag.shape[-2], mag.shape[-1]
    overlap = n_fft // hop_length
    Fp = _round_up(n_fft // 2 + 1, LANE)
    m = mag.reshape((-1, T, F)).astype(jnp.float32)
    B = m.shape[0]
    n_tiles = -(-(T + overlap) // tile_f)
    n_rows = n_tiles * tile_f + 8
    pads = n_rows - (T + 2)
    m_p = jnp.concatenate(
        [
            jnp.zeros((B, 1, F), jnp.float32),
            m,
            m[:, -1:, :],  # edge replicate: last frame's central time stencil
            jnp.zeros((B, pads, F), jnp.float32),
        ],
        axis=1,
    )
    m_p = jnp.pad(m_p, [(0, 0), (0, 0), (0, Fp - F)])
    mx = jnp.max(m, axis=(-2, -1), keepdims=True)
    abstol = jnp.maximum(tolerance * mx, 1.19e-7)
    abstol_rows = jnp.broadcast_to(abstol[..., 0], (B, Fp))
    if angles is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        angles = 2.0 * jnp.pi * jax.random.uniform(
            key, (B, n_tiles * tile_f, Fp), dtype=jnp.float32
        )
    else:
        angles = angles.reshape((-1, T, F)).astype(jnp.float32)
        angles = jnp.pad(
            angles, [(0, 0), (0, n_tiles * tile_f - T), (0, Fp - F)]
        )
    return m_p, abstol_rows, angles, B, T, F, Fp


def pghi_phases_fused(
    mag: jnp.ndarray,
    gamma: float,
    n_fft: int,
    hop_length: int,
    tolerance: float = 1e-2,
    key: Optional[jax.Array] = None,
    tile_f: int = 64,
    interpret: Optional[bool] = None,
    angles: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Offline PGHI *phases* ``mag (..., T, F) -> (..., T, F)`` in one kernel.

    The same in-kernel recurrence as :func:`pghi_invert_fused` with the
    synthesis stage skipped — equivalent to
    ``pghi_scan(mag, ..., time_stencil="central", parallel=False)``; serves
    the phase API (``STFT.pghi``) and the ``pghi_gl`` seed on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile_f = max(8, tile_f - tile_f % 8)
    batch_shape = mag.shape[:-2]
    T, F = mag.shape[-2], mag.shape[-1]
    B_total = 1
    for d in batch_shape:
        B_total *= d
    if B_total > 64:  # bound the per-step VMEM footprint (batch rides whole)
        parts = [
            pghi_phases_fused(
                mag.reshape((-1, T, F))[i: i + 64], gamma, n_fft, hop_length,
                tolerance=tolerance,
                key=None if key is None else jax.random.fold_in(key, i),
                tile_f=tile_f, interpret=interpret,
                angles=None if angles is None else angles.reshape((-1, T, F))[i: i + 64],
            )
            for i in range(0, B_total, 64)
        ]
        return jnp.concatenate(parts, axis=0).reshape(batch_shape + (T, F))
    m_p, abstol_rows, angles_p, B, T, F, Fp = _prep_mag(
        mag, n_fft, hop_length, tolerance, tile_f, key, angles
    )
    stub = jnp.zeros((8, LANE), jnp.bfloat16)  # synthesis basis unused
    fmul = float(gamma) / (hop_length * n_fft)
    rows = _fused_call(
        m_p, abstol_rows, angles_p, stub, n_fft, hop_length, tile_f,
        interpret, T, fmul, emit_phases=True,
    )
    return rows[:, :T, :F].reshape(batch_shape + (T, F))


def pghi_invert_fused(
    mag: jnp.ndarray,
    gamma: float,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    tolerance: float = 1e-2,
    length: Optional[int] = None,
    key: Optional[jax.Array] = None,
    tile_f: int = 64,
    interpret: Optional[bool] = None,
    angles: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Offline PGHI inversion ``mag (..., T, F) -> audio`` in one kernel.

    Equivalent to ``istft(mag * exp(1j * pghi_scan(mag, ...)), window)``
    with torch ISTFT conventions (centre trim, least-squares envelope);
    ``window`` is the SYNTHESIS window (the DGT's scaled dual).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Mosaic sublane rule: tile_f a multiple of 8 (mag halo over-fetches to
    # 8 rows, of which 2 are used)
    tile_f = max(8, tile_f - tile_f % 8)
    batch_shape = mag.shape[:-2]
    T, F = mag.shape[-2], mag.shape[-1]
    n_bins = n_fft // 2 + 1
    overlap = n_fft // hop_length
    Fp = _round_up(n_bins, LANE)
    m = mag.reshape((-1, T, F)).astype(jnp.float32)
    B = m.shape[0]
    if B > 64:
        # the batch rides whole in every block; split large batches so the
        # per-step VMEM footprint stays bounded (kernel state is per-row,
        # so slicing the batch is exact)
        parts = [
            pghi_invert_fused(
                m[i: i + 64], gamma, n_fft, hop_length, window,
                tolerance=tolerance, length=length,
                key=None if key is None else jax.random.fold_in(key, i),
                tile_f=tile_f, interpret=interpret,
                angles=None if angles is None else angles.reshape((-1, T, F))[i: i + 64],
            )
            for i in range(0, B, 64)
        ]
        return jnp.concatenate(parts, axis=0).reshape(
            batch_shape + parts[0].shape[-1:]
        )

    # shared padded-frame layout / abstol rows / silent-bin angles
    # (_prep_mag — the phases-only entry uses the identical prep, and the
    # two paths are asserted equivalent)
    m_p, abstol_rows, angles, B, T, F, Fp = _prep_mag(
        m, n_fft, hop_length, tolerance, tile_f, key, angles
    )

    # windowed iDFT basis, bf16x3-stacked: [re | im] (2 Fp) contract against
    # [[Ahi; Bhi], [Alo; Blo], [Ahi; Bhi]]-style stacking of (A; B) * window
    A, Bm = _idft_matrices(n_fft)
    w = jnp.asarray(window, jnp.float32)[None, :]
    AB = jnp.concatenate(
        [
            jnp.pad(jnp.asarray(A), [(0, Fp - n_bins), (0, 0)]) * w,
            jnp.pad(jnp.asarray(Bm), [(0, Fp - n_bins), (0, 0)]) * w,
        ],
        axis=0,
    )  # (2 Fp, n_fft) f32
    hi, lo = _split_bf16(AB)
    basis = jnp.concatenate([hi, lo, hi], axis=0)  # (6 Fp, n_fft) bf16

    fmul = float(gamma) / (hop_length * n_fft)
    rows = _fused_call(
        m_p, abstol_rows, angles, basis, n_fft, hop_length, tile_f,
        interpret, T, fmul,
    )  # (B, n_tiles*tile_f, hop)
    y = rows.reshape(B, -1)

    # least-squares envelope + centre trim (cheap XLA ops on the audio)
    env_frames = jnp.broadcast_to(w[0][None, :] ** 2, (T, n_fft))
    from ..framing import overlap_add

    env = overlap_add(env_frames, hop_length)
    env = jnp.pad(env, (0, max(0, y.shape[-1] - env.shape[-1])))[: y.shape[-1]]
    tiny = jnp.finfo(jnp.float32).tiny
    y = y / jnp.where(env > tiny, env, jnp.ones_like(env))

    start = n_fft // 2
    stop = (T - 1) * hop_length + n_fft - (n_fft - n_fft // 2)
    if length is not None:
        stop = start + length
    y = y[..., start:stop]
    if length is not None and y.shape[-1] < length:
        y = jnp.pad(y, [(0, 0), (0, length - y.shape[-1])])
    return y.reshape(batch_shape + y.shape[-1:])
