"""Shared in-kernel overlap-add for synthesis stages (Mosaic-safe).

Two layouts, chosen statically from (n_fft, hop):

* **aligned** (``hop % 128 == 0``): per-frame iDFT rows carve directly
  into ``(overlap, hop)`` lane blocks and overlap-add at hop stride.
* **packed small-hop** (``hop | 128``): ``q = 128/hop`` frames share one
  128-sample lane chunk.  The rows lane-pad ONCE (directly on the dot
  output — lane-dim pads of value slices trip Mosaic's "offset mismatch
  on non-concat dimension" check), each row shifts right by
  ``(row % q) * hop`` via log2(q) masked whole-array rolls (intermediate
  shifts stay < 128, so the circular wrap only ever moves the zero pad),
  super-frame members sum on the sublane dim, and the OLA runs at chunk
  granularity (super-frame stride = 1 chunk, span = n_fft/128 + 1).

Used by the one-kernel PGHI inversion (pghi_kernel.py) and the
whole-session streaming roundtrip (stream_step.py).  Reference OLA
semantics: acids_transforms/transforms/oadd.py:90-104 (redesigned — no
scatter; zero-padded adds only).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from .spectral import LANE

__all__ = ["ola_supported", "ola_layout", "ola_accumulate", "ola_tile_unit"]


def ola_supported(n_fft: int, hop: int) -> bool:
    return hop % LANE == 0 or (LANE % hop == 0 and n_fft % LANE == 0)


def _check_supported(n_fft: int, hop: int) -> None:
    # loud trace-time failure: an unsupported hop (e.g. 96 or 160) would
    # otherwise take the packed branch with the wrong q and return
    # silently corrupted audio in interpret mode (callers gate on
    # ola_supported before dispatching; this backstops direct calls)
    if not ola_supported(n_fft, hop):
        raise ValueError(
            f"in-kernel OLA needs hop % {LANE} == 0 or hop | {LANE} "
            f"(with n_fft % {LANE} == 0); got n_fft={n_fft} hop={hop}"
        )


def ola_tile_unit(hop: int) -> int:
    """Tile granularity for OLA-running kernels: multiples of 8 (Mosaic
    sublanes) and of q = LANE/hop for the packed small-hop layout (q is a
    power of two, so the lcm is just the max)."""
    if hop % LANE and LANE % hop == 0:
        return max(8, LANE // hop)
    return 8


def ola_layout(n_fft: int, hop: int, tile: int):
    """``(rows_out, out_w, carry_rows)`` for a ``tile``-frame OLA step:
    the output block is ``(B, rows_out, out_w)`` (= ``tile * hop`` samples)
    and the carried tail is ``(B, carry_rows, out_w)``."""
    _check_supported(n_fft, hop)
    if hop % LANE == 0:
        return tile, hop, n_fft // hop - 1
    q = LANE // hop
    return tile // q, LANE, n_fft // LANE


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
    q = LANE // hop
    n_chunk = n_fft // LANE
    S = tile // q
    W = (n_chunk + 1) * LANE
    tdp = jnp.pad(td, [(0, 0), (0, LANE)])  # (B*tile, W)
    ridx = jax.lax.broadcasted_iota(jnp.int32, tdp.shape, 0) % q
    bbit = 1
    while bbit < q:
        rolled = pltpu.roll(tdp, shift=bbit * hop, axis=1)
        tdp = jnp.where((ridx & bbit) != 0, rolled, tdp)
        bbit *= 2
    comb = tdp.reshape(B, S, q, W).sum(axis=2)
    comb = comb.reshape(B, S, n_chunk + 1, LANE)
    acc = jnp.zeros((B, S + n_chunk, LANE), f32)
    for c in range(n_chunk + 1):
        acc = acc + jnp.pad(
            comb[:, :, c, :], [(0, 0), (c, n_chunk - c), (0, 0)]
        )
    return acc, S
