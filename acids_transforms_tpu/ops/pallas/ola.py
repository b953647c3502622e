"""Shared in-kernel overlap-add for synthesis stages (Mosaic-safe).

Two layouts, chosen statically from (n_fft, hop):

* **aligned** (``hop % 128 == 0``): per-frame iDFT rows carve directly
  into ``(overlap, hop)`` lane blocks and overlap-add at hop stride.
* **lcm-packed** (``hop % 8 == 0``, ``n_fft % 128 == 0``): with
  ``g = gcd(hop, 128)``, ``q = 128/g`` frames share one *super-frame* of
  ``q*hop`` samples — a whole number ``st = q*hop/128`` of lane chunks
  (``st == 1`` is the small-hop ``hop | 128`` case; ``st > 1`` covers
  hops like 192, 96, 160 that neither divide nor are multiples of the
  lane width).  The rows lane-pad ONCE (directly on the dot output —
  lane-dim pads of value slices trip Mosaic's "offset mismatch on
  non-concat dimension" check), each member shifts right by
  ``(row % q) * hop`` via log2(q) masked whole-array rolls (cumulative
  shifts stay <= the zero pad, so the circular wrap only ever moves
  padding), super-frame members sum on the sublane dim, and the OLA runs
  at chunk granularity with super-frame stride ``st``: chunk ``c`` of
  super-frame ``s`` lands at chunk row ``s*st + c``, accumulated per
  residue ``c % st`` with zero-padded adds and interleaved back on the
  sublane axis (no scatters).

Used by the one-kernel PGHI inversion (pghi_kernel.py) and the
whole-session streaming roundtrip (stream_step.py).  Reference OLA
semantics: acids_transforms/transforms/oadd.py:90-104 (redesigned — no
scatter; zero-padded adds only).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from .spectral import LANE, _round_up

__all__ = ["ola_supported", "ola_layout", "ola_accumulate", "ola_tile_unit"]

# largest frames-per-super-frame the general lcm packing accepts: q = 16
# means hop % 8 == 0 (tile granularity 16, shift-pad <= 15*hop) — beyond
# that the roll ladder and pad overhead stop paying for themselves.
# Divisor hops (hop | 128) are EXEMPT from the cap: their super-frame is
# one chunk (st = 1, shift pad < 128) at any q, and the pre-r3.17 layout
# accepted them — capping would silently narrow support for hop <= 4.
_MAX_Q = 16


def _packing(n_fft: int, hop: int):
    """``(q, st, W)`` for the lcm-packed layout: q frames per super-frame,
    st = q*hop/LANE chunks of super-frame stride, W the per-frame padded
    row width (a multiple of st*LANE so every super-frame is a whole
    number of stride groups)."""
    q = LANE // math.gcd(hop, LANE)
    st = q * hop // LANE
    W = _round_up(n_fft + (q - 1) * hop, st * LANE)
    return q, st, W


def ola_supported(n_fft: int, hop: int) -> bool:
    if hop % LANE == 0:
        return True
    if n_fft % LANE != 0:
        return False
    q = LANE // math.gcd(hop, LANE)
    return LANE % hop == 0 or q <= _MAX_Q


def _check_supported(n_fft: int, hop: int) -> None:
    # loud trace-time failure: an unsupported hop (e.g. 100) would
    # otherwise take the packed branch with a huge q and return
    # silently corrupted audio in interpret mode (callers gate on
    # ola_supported before dispatching; this backstops direct calls)
    if not ola_supported(n_fft, hop):
        raise ValueError(
            f"in-kernel OLA needs hop % {LANE} == 0, or hop % 8 == 0 "
            f"with n_fft % {LANE} == 0; got n_fft={n_fft} hop={hop}"
        )


def ola_tile_unit(hop: int) -> int:
    """Tile granularity for OLA-running kernels: multiples of 8 (Mosaic
    sublanes) and of q = LANE/gcd(hop, LANE) for the packed layout (q is
    a power of two, so the lcm is just the max)."""
    if hop % LANE:
        return max(8, LANE // math.gcd(hop, LANE))
    return 8


def ola_layout(n_fft: int, hop: int, tile: int):
    """``(rows_out, out_w, carry_rows)`` for a ``tile``-frame OLA step:
    the output block is ``(B, rows_out, out_w)`` (= ``tile * hop`` samples)
    and the carried tail is ``(B, carry_rows, out_w)``."""
    _check_supported(n_fft, hop)
    if hop % LANE == 0:
        return tile, hop, n_fft // hop - 1
    q, st, W = _packing(n_fft, hop)
    K = W // LANE // st  # stride groups per super-frame
    return (tile // q) * st, LANE, (K - 1) * st


def ola_accumulate(td, B: int, tile: int, n_fft: int, hop: int):
    """Overlap-add ``td (B*tile, n_fft)`` windowed iDFT frames.

    Returns ``(acc, S)``: ``acc (B, S + carry_rows, out_w)`` with the
    first ``S`` rows the step's emitted samples and the rest the tail to
    carry (see :func:`ola_layout`).
    """
    f32 = jnp.float32
    _check_supported(n_fft, hop)
    overlap = n_fft // hop
    if hop % LANE == 0:
        g = td.reshape(B, tile, overlap, hop)
        acc = jnp.zeros((B, tile + overlap - 1, hop), f32)
        for j in range(overlap):
            acc = acc + jnp.pad(
                g[:, :, j, :], [(0, 0), (j, overlap - 1 - j), (0, 0)]
            )
        return acc, tile
    q, st, W = _packing(n_fft, hop)
    n_w = W // LANE
    K = n_w // st
    S = tile // q  # super-frames in this step
    tdp = jnp.pad(td, [(0, 0), (0, W - n_fft)])  # (B*tile, W)
    # member r of each super-frame shifts right by r*hop, decomposed over
    # the bits of r; after the bits <= bbit the cumulative shift is
    # (r & (2*bbit - 1)) * hop <= (q-1)*hop <= W - n_fft, so the circular
    # wrap only ever moves zero padding
    ridx = jax.lax.broadcasted_iota(jnp.int32, tdp.shape, 0) % q
    bbit = 1
    while bbit < q:
        rolled = pltpu.roll(tdp, shift=(bbit * hop) % W, axis=1)
        tdp = jnp.where((ridx & bbit) != 0, rolled, tdp)
        bbit *= 2
    comb = tdp.reshape(B, S, q, W).sum(axis=2)  # (B, S, W) super-frames
    comb = comb.reshape(B, S, n_w, LANE)
    # chunk c of super-frame s lands at chunk row s*st + c = (s+k)*st + r
    # with c = k*st + r: accumulate per residue r with zero-padded adds,
    # then interleave the st residue planes back on the sublane axis
    M = S + K - 1
    planes = []
    for r in range(st):
        acc_r = jnp.zeros((B, M, LANE), f32)
        for k in range(K):
            acc_r = acc_r + jnp.pad(
                comb[:, :, k * st + r, :], [(0, 0), (k, K - 1 - k), (0, 0)]
            )
        planes.append(acc_r)
    if st == 1:
        return planes[0], S
    acc = jnp.stack(planes, axis=2).reshape(B, M * st, LANE)
    return acc, S * st
