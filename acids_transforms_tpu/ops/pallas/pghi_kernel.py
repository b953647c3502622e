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
from .ola import ola_accumulate, ola_layout, ola_supported, ola_tile_unit
from .spectral import LANE, _append_nyq, _round_up, _split_bf16

# UP-fill lane depad (r3.19): run the forward segmented fill at
# Fd = Fp - 128 lanes (one fewer Hillis-Steele stage, 20% narrower ops)
# and recover the nyquist lane by composing lane Fd-1's inclusive
# composite with the nyquist's own affine map.  Only the UP direction —
# the DOWN fill's chain *includes* the nyquist at its head, whose
# pre-compose epilogue eats the savings (BENCH_NOTES.md r3.13 scoping).
# MEASURED NEGATIVE (r3.19, v5e A/B with ACIDS_PGHI_UP_DEPAD=1): -1.8%
# at 1024/256 B=8, -9.6% at 512/128 B=8, a wash at B=1 — the per-frame
# epilogue (two full-width masked reduces + two lane concats) costs more
# than the narrower scan saves, and the gap widens as Fp shrinks.  Kept
# as an env-gated opt-in so the A/B stays reproducible; output matches
# the full-width scan (identical rel vs the serial oracle).
import os as _os

UP_DEPAD = _os.environ.get("ACIDS_PGHI_UP_DEPAD", "0") == "1"

__all__ = [
    "pghi_invert_fused", "pghi_phases_fused", "pghi_fused_available",
    "pghi_phases_available",
    "pghi_phases_bidir", "pghi_invert_bidir", "pghi_synthesize_fused",
]


def pghi_fused_available(n_fft: int, hop_length: int) -> bool:
    # Synthesis needs a lane-expressible overlap-add: either hop itself is
    # a lane multiple (the reshape (B*tile_f, overlap*hop) ->
    # (B, tile_f, overlap, hop) carves lanes directly), or the lcm-packed
    # layout applies — q = 128/gcd(hop, 128) frames share a super-frame of
    # q*hop samples (a whole number of 128-lane chunks), members shift by
    # masked rolls and the OLA runs at chunk granularity with super-frame
    # stride q*hop/128 (ops/pallas/ola.py).  That covers every hop % 8 == 0
    # at n_fft % 128 == 0 (e.g. 64, 96, 160, 192); anything else falls
    # back to the sqrt-blocked XLA path.
    return (
        n_fft % hop_length == 0
        and n_fft // hop_length >= 2
        and ola_supported(n_fft, hop_length)
    )


def pghi_phases_available(n_fft: int, hop_length: int) -> bool:
    """Gate for the PHASES-ONLY kernel modes (no synthesis stage): the
    OLA lane-alignment constraints of :func:`pghi_fused_available` don't
    apply — hop enters the phase math only as the ``2*pi*hop/n_fft``
    carrier scale and the gamma normalization, neither of which cares
    about lane layout."""
    return n_fft % hop_length == 0 and n_fft // hop_length >= 2


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
    *, tile_f, n_bins, Fp, n_fft, hop, T_real, fmul, eps,
    emit_phases=False, bidir=False, phases_in=False,
):
    """One grid step: ``tile_f`` frames of fill + synthesis (see module docs).

    ``mag_ref`` block rows r = 0..tile_f+1 hold padded frames
    ``g0 - 1 .. g0 + tile_f`` (g0 = tile * tile_f): each frame's central
    time stencil reads its neighbours directly.

    ``bidir`` (phases-only): the batch dim stacks TWO chains — rows
    ``[:B/2]`` walk frames forward from the seed, rows ``[B/2:]`` walk the
    time-REVERSED left half (host-side flip).  Both run the same
    instruction stream; a per-row sign flips the time-trapezoid and the
    time-derivative term of the freq gradient (the freq-axis math is
    direction-agnostic), and after the joint seed step the left chain's
    phase carry is copied from the right chain's seed-frame phase — the
    two half-fields integrate coherently from one seed.  Serial depth
    drops T -> max(T_right, T_left) ~ T/2 (BENCH_NOTES.md r3.7).

    ``phases_in``: skip the recurrence entirely — ``angles_ref`` carries
    precomputed phases and only the synthesis (windowed iDFT + OLA) runs
    (the assembly stage of the bidirectional inversion).
    """
    tile = pl.program_id(0)
    B = mag_ref.shape[0]
    f32 = jnp.float32

    @pl.when(tile == 0)
    def _init():
        phi_ref[...] = jnp.zeros((B, Fp), f32)
        tail_ref[...] = jnp.zeros_like(tail_ref)

    abstol = abstol_ref[...]  # (B, Fp) broadcast rows

    M = mag_ref[...][:, : tile_f + 2, :]           # frames g0-1 .. g0+tile_f
    Mc = M[:, 1: tile_f + 1, :]
    # NEVER slice a broadcasted_iota: Mosaic keeps iotas replicated (one
    # sublane) and slicing the sublane dim hits a layout CHECK; build them
    # at the exact shape instead
    lanec = jax.lax.broadcasted_iota(jnp.int32, (B, tile_f, Fp), 2)
    in_binsc = lanec < n_bins

    if phases_in:
        phis = angles_ref[...]
    else:
        # ---- tile-level precompute (r3.5): everything except the serial
        # phase carry vectorizes over the tile's frames — the loop below
        # keeps only the trapezoid add, the two segmented scans and the
        # selects.  The previous per-frame formulation recomputed
        # log-magnitudes 3x per frame and ran the derivative/anchor/trig
        # work one (B, Fp) row at a time; this block is ~2/3 of what made
        # each serial step expensive.  The ts carry is gone entirely: block
        # row 0 is the previous tile's last frame (frame -1 is all-zero =>
        # log(eps), dY_dk = 0, carrier-only — the old _init value).
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (B, tile_f + 2, Fp), 2)
        ck3 = (2.0 * np.pi * hop / n_fft) * lane3.astype(f32)
        Y = jnp.log(jnp.maximum(M, eps))           # ONE log per frame row
        # freq derivative of log-mag (central, replicate edges, valid lanes)
        Y_dn = jnp.where(lane3 == 0, Y, pltpu.roll(Y, shift=1, axis=2))
        Y_up = jnp.where(
            lane3 == n_bins - 1, Y, pltpu.roll(Y, shift=Fp - 1, axis=2)
        )
        ts_all = ((Y_up - Y_dn) / 2.0) / fmul + ck3    # (B, tile_f+2, Fp)
        ct = (ts_all[:, :tile_f, :] + ts_all[:, 1: tile_f + 1, :]) / 2.0
        # time derivative (central; the +1 halo row is the edge-replicate)
        dY_dt = (Y[:, 2:, :] - Y[:, :-2, :]) / 2.0
        if bidir:
            # the reversed (left) chain walks true time backward: its time
            # trapezoid subtracts, and the array's time derivative is the
            # negated true one — one per-row sign fixes both; the freq-axis
            # math (rolls over lanes) is direction-agnostic
            bidx = jax.lax.broadcasted_iota(jnp.int32, (B, tile_f, Fp), 0)
            sgn = jnp.where(bidx < B // 2, 1.0, -1.0).astype(f32)
            ct_ref[...] = sgn * ct
            fs = sgn * (-fmul * dY_dt) + np.pi
        else:
            ct_ref[...] = ct
            fs = -fmul * dY_dt + np.pi
        # frequency-fill trapezoid steps, both directions
        sup_ref[...] = jnp.where(
            lanec == 0, 0.0, (fs + pltpu.roll(fs, shift=1, axis=2)) / 2.0
        )
        sdn_ref[...] = jnp.where(
            lanec == n_bins - 1, 0.0,
            -(fs + pltpu.roll(fs, shift=Fp - 1, axis=2)) / 2.0,
        )
        # sublane-dim broadcasts must be explicit for Mosaic (lane-dim
        # keepdims broadcasts below are fine)
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
        # fold the silent-bin fallback into one field: sig bins keep a
        # sentinel (resolved in-loop), silent bins carry their random phase
        sig_ref[...] = sig.astype(f32)

        Fd = Fp - LANE
        up_depad = UP_DEPAD and Fd == n_bins - 1 and (Fd & (Fd - 1)) == 0
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (B, Fp), 1)

        def frame_step(t, _):
            anc_f = anc_ref[:, t, :]
            anchored = anc_f > 0.5

            # anchored bins: time trapezoid from the previous frame's phase
            phi_t = phi_ref[...] + ct_ref[:, t, :]

            a0 = 1.0 - anc_f
            b_dn = jnp.where(anchored, phi_t, sdn_ref[:, t, :])
            # d0 = a0: 0 at anchors, 1 elsewhere
            a_d, f_dn, d_dn = _seg_scan(a0, b_dn, a0, Fp, reverse=True)
            big = jnp.float32(10 * Fp)
            if up_depad:
                # depadded UP fill: operands read as (B, Fd) ref slices
                # (value slices feeding rolls trip Mosaic's offset check)
                anc_d = anc_ref[:, t, :Fd]
                anchored_d = anc_d > 0.5
                phi_t_d = phi_ref[:, :Fd] + ct_ref[:, t, :Fd]
                a0_d = 1.0 - anc_d
                b_up_d = jnp.where(anchored_d, phi_t_d, sup_ref[:, t, :Fd])
                a_u_d, f_up_d, d_up_d = _seg_scan(
                    a0_d, b_up_d, a0_d, Fd, reverse=False
                )
                lane_d = jax.lax.broadcasted_iota(jnp.int32, (B, Fd), 1)

                def last_d(v):  # lane Fd-1 of the depadded scan, (B, 1)
                    return jnp.sum(
                        jnp.where(lane_d == Fd - 1, v, 0.0), -1, keepdims=True
                    )

                def col_ny(v):  # the nyquist column of a full-width row
                    return jnp.sum(
                        jnp.where(lane2 == n_bins - 1, v, 0.0),
                        -1, keepdims=True,
                    )

                # nyquist's own map composed onto lane Fd-1's inclusive
                # composite — exactly the full-width scan's lane-n_bins-1
                # result (affine composition; associativity reorder only)
                anc_ny = col_ny(anc_f)
                a_own = 1.0 - anc_ny
                b_own = jnp.where(
                    anc_ny > 0.5, col_ny(phi_t), col_ny(sup_ref[:, t, :])
                )
                b_ny = last_d(f_up_d) * a_own + b_own
                a_ny = last_d(a_u_d) * a_own
                d_ny = last_d(d_up_d) * a_own + a_own
                f_up = _append_nyq(f_up_d, b_ny)
                # pad lanes get du = 0 <= dd -> filled = f_up = 0 there:
                # don't-care (sig masks them to the random angles below)
                du = _append_nyq(
                    jnp.where(a_u_d == 0, d_up_d, big),
                    jnp.where(a_ny == 0, d_ny, big),
                )
            else:
                b_up = jnp.where(anchored, phi_t, sup_ref[:, t, :])
                a_u, f_up, d_up = _seg_scan(a0, b_up, a0, Fp, reverse=False)
                du = jnp.where(a_u == 0, d_up, big)
            dd = jnp.where(a_d == 0, d_dn, big)
            filled = jnp.where(du <= dd, f_up, f_dn)
            any_anchor = jnp.any(anchored, axis=-1, keepdims=True)
            filled = jnp.where(any_anchor, filled, 0.0)

            phi = jnp.where(anchored, phi_t, filled)
            phi = jnp.where(sig_ref[:, t, :] > 0.5, phi, angles_ref[:, t, :])

            phi_ref[...] = phi
            if bidir:
                # seed handoff — LOAD-BEARING: the left chain's own seed-step
                # result uses the mirrored trapezoid (different operands than
                # the right chain's) and is discarded; overwriting its carry
                # with the right chain's seed phase is what makes the two
                # half-fields one coherent integration.  Removing this copy
                # decoheres the halves (boundary-frame interference in the
                # OLA) even though every per-frame field stays locally valid.
                @pl.when((tile == 0) & (t == 0))
                def _seed():
                    phi_ref[B // 2:, :] = phi_ref[: B // 2, :]
            # trig + magnitude application vectorize after the loop
            reim_ref[:, pl.ds(t, 1), :Fp] = phi[:, None, :]
            return 0

        jax.lax.fori_loop(0, tile_f, frame_step, 0, unroll=False)
        if emit_phases:
            o_ref[...] = reim_ref[...][:, :, :Fp]
            return
        phis = reim_ref[...][:, :, :Fp]

    # synthesis operands (zero outside real frames/bins), whole-tile trig
    row3 = jax.lax.broadcasted_iota(jnp.int32, (B, tile_f, Fp), 1)
    valid = (tile * tile_f + row3) < T_real
    mm = jnp.where(in_binsc & valid, Mc, 0.0)
    reim_ref[...] = jnp.concatenate(
        [mm * jnp.cos(phis), mm * jnp.sin(phis)], axis=2
    )

    # ---- synthesis: windowed iDFT of the tile's frames + overlap-add
    flat = reim_ref[...].reshape(B * tile_f, 2 * Fp)
    hi, lo = _split_bf16(flat)
    stacked = jnp.concatenate([hi, hi, lo], axis=1)  # (B*tile_f, 6 Fp)
    td = jnp.dot(stacked, basis_ref[...], preferred_element_type=f32)
    # aligned hop: carve (overlap, hop) lane blocks; hop % 8 == 0: the
    # lcm-packed layout (q frames per super-frame) — see ops/pallas/ola.py
    rows, S = ola_accumulate(td, B, tile_f, n_fft, hop)
    # (no scatter in Mosaic: add the carried tail via a zero-padded concat)
    rows = rows + jnp.concatenate(
        [tail_ref[...], jnp.zeros((B, S, rows.shape[-1]), f32)], axis=1
    )
    tail_ref[...] = rows[:, S:, :]
    o_ref[...] = rows[:, :S, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "tile_f", "interpret", "T_real", "fmul",
        "emit_phases", "bidir", "phases_in",
    ),
)
def _fused_call(
    mag_p, abstol_rows, angles, basis, n_fft, hop_length, tile_f, interpret,
    T_real, fmul, emit_phases=False, bidir=False, phases_in=False,
):
    B, n_rows, Fp = mag_p.shape
    n_tiles = (n_rows - 8) // tile_f
    n_bins = n_fft // 2 + 1
    eps = 1.19e-7
    if emit_phases:
        # synthesis never runs: a lane-aligned stub keeps the scratch
        # legal for ANY hop (the phases-only gate has no lane constraint)
        out_w, rows_out = Fp, tile_f
        tail_shape = (8, LANE)
    else:
        # aligned hops emit hop-sample rows; packed small hops emit
        # 128-sample chunk rows (q frames each) — see ops/pallas/ola.py
        rows_out, out_w, carry_rows = ola_layout(n_fft, hop_length, tile_f)
        tail_shape = (B, carry_rows, out_w)

    kernel = functools.partial(
        _pghi_invert_kernel,
        tile_f=tile_f, n_bins=n_bins, Fp=Fp, n_fft=n_fft, hop=hop_length,
        T_real=T_real, fmul=float(fmul), eps=eps,
        emit_phases=emit_phases, bidir=bidir, phases_in=phases_in,
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
            (B, rows_out, out_w), lambda t: (0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_tiles * rows_out, out_w), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((B, Fp), jnp.float32),                # phi carry
            pltpu.VMEM(tail_shape, jnp.float32),             # OLA tail
            pltpu.VMEM((B, tile_f, 2 * Fp), jnp.float32),    # re | im
        ]
        + [
            # the recurrence's per-tile fields (trapezoid, fill steps,
            # anchor/significance masks) — stubs when phases_in skips the
            # recurrence entirely (they would otherwise double the
            # synthesize-only kernel's VMEM footprint)
            pltpu.VMEM(
                (8, LANE) if phases_in else (B, tile_f, Fp), jnp.float32
            )
            for _ in range(5)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mag_p, abstol_rows, angles, basis)
    return out


def _slab_b(n_fft, hop_length, tile_f, emit_phases=False, phases_in=False):
    """Largest batch slab whose :func:`_fused_call` fits scoped VMEM.

    Every block rides the batch whole, so the kernel's scoped-VMEM stack
    grows linearly in B; the historical fixed slab of 64 OOMs at
    1024/256 (synthesize: measured 115.3M vs the 100M limit; the full
    recurrence crashes the compile helper outright at B >= 48).  The
    per-B byte model below sums the double-buffered input/output blocks
    and the scratch rows; the 56 MB budget is fitted to the measured
    scoped sizes (synth 1024/256 B64 = 115.3M, invert 512/128 B64 =
    110.8M, phases 512/128 B64 = 101.7M — the compiler's accounting
    runs ~1.2-1.6x the raw block sum, and 56 MB keeps every accepted
    slab's extrapolated scoped size under ~90M while still admitting
    the measured-OK 512-shape slabs at >= 40)."""
    n_bins = n_fft // 2 + 1
    Fp = _round_up(n_bins, LANE)
    if emit_phases:
        rows_out, out_w, carry_rows = tile_f, Fp, 8
    else:
        rows_out, out_w, carry_rows = ola_layout(n_fft, hop_length, tile_f)
    per_b = 4 * (
        2 * (tile_f + 8) * Fp          # mag halo block, double-buffered
        + 2 * tile_f * Fp              # angles block
        + 2 * rows_out * out_w         # output block
        + Fp                           # phi carry
        + carry_rows * out_w           # OLA tail
        + tile_f * 2 * Fp              # re | im scratch
        + (0 if phases_in else 5 * tile_f * Fp)  # recurrence fields
    )
    return max(8, min(64, (56 * 1024 * 1024 // per_b) // 8 * 8))


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
    slab = _slab_b(n_fft, hop_length, tile_f, emit_phases=True)
    if B_total > slab:  # bound the per-step VMEM footprint (batch rides whole)
        parts = [
            pghi_phases_fused(
                mag.reshape((-1, T, F))[i: i + slab], gamma, n_fft, hop_length,
                tolerance=tolerance,
                key=None if key is None else jax.random.fold_in(key, i),
                tile_f=tile_f, interpret=interpret,
                angles=None if angles is None else angles.reshape((-1, T, F))[i: i + slab],
            )
            for i in range(0, B_total, slab)
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


def _synth_basis(window, n_fft, Fp, n_bins):
    """Windowed iDFT basis, bf16x3-stacked: [re | im] (2 Fp) contracts
    against [[Ahi; Bhi], [Alo; Blo], [Ahi; Bhi]]-style stacking of
    (A; B) * window.  Shared by the one-kernel inversion and the
    phases-in synthesis stage of the bidirectional path."""
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
    return jnp.concatenate([hi, lo, hi], axis=0)  # (6 Fp, n_fft) bf16


def _finish_audio(y, window, T, n_fft, hop_length, length, batch_shape):
    """Least-squares envelope division + centre trim (cheap XLA ops on the
    small audio tensor; torch ISTFT conventions)."""
    from ..framing import overlap_add

    w = jnp.asarray(window, jnp.float32)
    env_frames = jnp.broadcast_to(w[None, :] ** 2, (T, n_fft))
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
    # 8 rows, of which 2 are used); packed small hops also need q | tile_f
    unit = ola_tile_unit(hop_length)
    tile_f = max(unit, tile_f - tile_f % unit)
    batch_shape = mag.shape[:-2]
    T, F = mag.shape[-2], mag.shape[-1]
    n_bins = n_fft // 2 + 1
    overlap = n_fft // hop_length
    Fp = _round_up(n_bins, LANE)
    m = mag.reshape((-1, T, F)).astype(jnp.float32)
    B = m.shape[0]
    slab = _slab_b(n_fft, hop_length, tile_f)
    if B > slab:
        # the batch rides whole in every block; split large batches so the
        # per-step VMEM footprint stays bounded (kernel state is per-row,
        # so slicing the batch is exact)
        parts = [
            pghi_invert_fused(
                m[i: i + slab], gamma, n_fft, hop_length, window,
                tolerance=tolerance, length=length,
                key=None if key is None else jax.random.fold_in(key, i),
                tile_f=tile_f, interpret=interpret,
                angles=None if angles is None else angles.reshape((-1, T, F))[i: i + slab],
            )
            for i in range(0, B, slab)
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

    basis = _synth_basis(window, n_fft, Fp, n_bins)
    fmul = float(gamma) / (hop_length * n_fft)
    rows = _fused_call(
        m_p, abstol_rows, angles, basis, n_fft, hop_length, tile_f,
        interpret, T, fmul,
    )  # (B, n_tiles*tile_f, hop)
    return _finish_audio(
        rows.reshape(B, -1), window, T, n_fft, hop_length, length, batch_shape
    )


def pghi_phases_bidir(
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
    """Bidirectional offline PGHI phases: seed at the MID frame, integrate
    left and right halves simultaneously as one batch-stacked kernel.

    The serial fill scans bound the one-kernel PGHI (~3.2 us/frame of
    dependency latency, BENCH_NOTES.md r3.5); stacking the time-reversed
    left half under the right half halves the serial depth while the VPU
    runs both chains in the same (2B, Fp) vector ops.  The phase field is
    one coherent integration from the seed (the left chain starts from the
    seed frame's phase, see `_pghi_invert_kernel` bidir note) — closer in
    spirit to the reference heap's grow-outward order (dgt.py:168-220)
    than the strictly causal scan; output differs from ``pghi_scan``
    (different integration order), quality is gated by spectral
    convergence in the tests/bench.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile_f = max(8, tile_f - tile_f % 8)
    batch_shape = mag.shape[:-2]
    T, F = mag.shape[-2], mag.shape[-1]
    m = mag.reshape((-1, T, F)).astype(jnp.float32)
    B = m.shape[0]
    if T < 4:
        return pghi_phases_fused(
            mag, gamma, n_fft, hop_length, tolerance=tolerance, key=key,
            tile_f=tile_f, interpret=interpret, angles=angles,
        )
    slab = max(8, _slab_b(n_fft, hop_length, tile_f, emit_phases=True) // 2)
    if B > slab:  # the stacked (2B) batch rides whole in every block
        parts = [
            pghi_phases_bidir(
                m[i: i + slab], gamma, n_fft, hop_length, tolerance=tolerance,
                key=None if key is None else jax.random.fold_in(key, i),
                tile_f=tile_f, interpret=interpret,
                angles=None if angles is None else angles.reshape((-1, T, F))[i: i + slab],
            )
            for i in range(0, B, slab)
        ]
        return jnp.concatenate(parts, axis=0).reshape(batch_shape + (T, F))

    mid = T // 2
    overlap = n_fft // hop_length
    n_bins = n_fft // 2 + 1
    Fp = _round_up(n_bins, LANE)
    # right body walks frames mid..T-1 forward; left body is
    # [seed | mid-1 .. 0] (time-reversed, the seed row duplicated so both
    # chains compute the seed jointly — the left row 0 result is discarded).
    # Unlike the causal scan's frame 0 (signal start, quiet), the seed sits
    # mid-signal: its pre-pad row is the TRUE neighbouring frame so the
    # seed's time stencil/anchor continuity are accurate (a zero pre-pad
    # measurably degrades SC ~8% on harmonic content)
    right = m[:, mid:, :]
    left = jnp.concatenate(
        [m[:, mid: mid + 1, :], jnp.flip(m[:, :mid, :], axis=1)], axis=1
    )
    Tr, Tl = right.shape[1], left.shape[1]
    Tmax = max(Tr, Tl)
    n_tiles = -(-(Tmax + overlap) // tile_f)
    n_rows = n_tiles * tile_f + 8

    def lay(body, prepad):
        Tb = body.shape[1]
        out = jnp.concatenate(
            [
                prepad,
                body,
                body[:, -1:, :],
                jnp.zeros((B, n_rows - (Tb + 2), F), jnp.float32),
            ],
            axis=1,
        )
        return jnp.pad(out, [(0, 0), (0, 0), (0, Fp - F)])

    m_p = jnp.concatenate(
        [
            lay(right, m[:, mid - 1: mid, :]),
            lay(left, m[:, mid + 1: mid + 2, :]),
        ],
        axis=0,
    )  # (2B, rows, Fp)
    # shared GLOBAL abstol (the serial scan thresholds against the whole
    # spectrogram's max — per-half maxima would move anchors)
    mx = jnp.max(m, axis=(-2, -1), keepdims=True)
    abstol = jnp.maximum(tolerance * mx, 1.19e-7)
    ab = jnp.broadcast_to(abstol[..., 0], (B, Fp))
    abstol_rows = jnp.concatenate([ab, ab], axis=0)
    if angles is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        angles2 = 2.0 * jnp.pi * jax.random.uniform(
            key, (2 * B, n_tiles * tile_f, Fp), dtype=jnp.float32
        )
    else:
        a = angles.reshape((-1, T, F)).astype(jnp.float32)
        ar = a[:, mid:, :]
        al = jnp.concatenate(
            [a[:, mid: mid + 1, :], jnp.flip(a[:, :mid, :], axis=1)], axis=1
        )

        def lay_a(body):
            return jnp.pad(
                body,
                [(0, 0), (0, n_tiles * tile_f - body.shape[1]), (0, Fp - F)],
            )

        angles2 = jnp.concatenate([lay_a(ar), lay_a(al)], axis=0)

    stub = jnp.zeros((8, LANE), jnp.bfloat16)  # synthesis basis unused
    fmul = float(gamma) / (hop_length * n_fft)
    rows = _fused_call(
        m_p, abstol_rows, angles2, stub, n_fft, hop_length, tile_f,
        interpret, Tmax, fmul, emit_phases=True, bidir=True,
    )
    right_ph = rows[:B, :Tr, :]
    left_ph = jnp.flip(rows[B:, 1:Tl, :], axis=1)  # frames 0..mid-1
    phases = jnp.concatenate([left_ph, right_ph], axis=1)[:, :, :F]
    return phases.reshape(batch_shape + (T, F))


def pghi_synthesize_fused(
    mag: jnp.ndarray,
    phases: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    length: Optional[int] = None,
    tile_f: int = 64,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """``istft(mag * e^{i phases})`` via the fused synthesis stage only
    (windowed iDFT + in-VMEM OLA; torch ISTFT conventions) — the assembly
    half of the bidirectional inversion.  ``window`` is the SYNTHESIS
    window."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    unit = ola_tile_unit(hop_length)
    tile_f = max(unit, tile_f - tile_f % unit)
    batch_shape = mag.shape[:-2]
    T, F = mag.shape[-2], mag.shape[-1]
    n_bins = n_fft // 2 + 1
    m = mag.reshape((-1, T, F)).astype(jnp.float32)
    B = m.shape[0]
    slab = _slab_b(n_fft, hop_length, tile_f, phases_in=True)
    if B > slab:
        parts = [
            pghi_synthesize_fused(
                m[i: i + slab], phases.reshape((-1, T, F))[i: i + slab],
                n_fft, hop_length, window, length=length, tile_f=tile_f,
                interpret=interpret,
            )
            for i in range(0, B, slab)
        ]
        return jnp.concatenate(parts, axis=0).reshape(
            batch_shape + parts[0].shape[-1:]
        )
    # the angles operand carries the phases (same padded layout)
    m_p, abstol_rows, phases_p, B, T, F, Fp = _prep_mag(
        m, n_fft, hop_length, 1.0, tile_f, None, phases
    )
    basis = _synth_basis(window, n_fft, Fp, n_bins)
    rows = _fused_call(
        m_p, abstol_rows, phases_p, basis, n_fft, hop_length, tile_f,
        interpret, T, 1.0, phases_in=True,
    )
    return _finish_audio(
        rows.reshape(B, -1), window, T, n_fft, hop_length, length, batch_shape
    )


def pghi_invert_bidir(
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
    """Bidirectional offline PGHI inversion: :func:`pghi_phases_bidir`
    (serial depth ~T/2) + :func:`pghi_synthesize_fused`."""
    phases = pghi_phases_bidir(
        mag, gamma, n_fft, hop_length, tolerance=tolerance, key=key,
        tile_f=tile_f, interpret=interpret, angles=angles,
    )
    return pghi_synthesize_fused(
        mag, phases, n_fft, hop_length, window, length=length,
        tile_f=tile_f, interpret=interpret,
    )
