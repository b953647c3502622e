"""Framing / overlap-add primitives.

TPU-native equivalents of the reference's strided framing helpers
(reference: acids_transforms/utils/misc.py:138-178).  On TPU there is no
``as_strided``; instead:

* when ``hop`` divides ``wsize`` the signal is reshaped into hop-sized chunks
  and frames are built from ``wsize//hop`` shifted slices — pure slices +
  concat, which XLA fuses into cheap copies;
* otherwise a gather with a precomputed (static) index matrix is used.

Overlap-add (the ISTFT core) is expressed as ``overlap`` shifted, padded adds
rather than a scatter — everything stays dense, static-shaped, and fusable.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["frame", "overlap_add", "pad_axis", "reshape_batches", "num_frames"]


def num_frames(length: int, wsize: int, hsize: int) -> int:
    """Number of frames produced by :func:`frame` for a length-``length`` signal.

    Matches the reference's ``frame`` (utils/misc.py:148-165): the tail is
    zero-padded so that ``(n - 1) * hop + wsize`` covers the signal.
    """
    return max((int(length) - int(wsize)) // int(hsize), 0) + 1


def pad_axis(x: jnp.ndarray, target: int, axis: int) -> jnp.ndarray:
    """Zero-pad ``axis`` of ``x`` up to ``target`` (reference utils/misc.py:138-145)."""
    axis = axis % x.ndim
    size = x.shape[axis]
    if size >= target:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


def frame(x: jnp.ndarray, wsize: int, hsize: int, axis: int = -1) -> jnp.ndarray:
    """Slice ``x`` into overlapping frames along ``axis``.

    Output inserts a frame axis before the window axis:
    ``(..., L, ...) -> (..., n_frames, wsize, ...)`` at ``axis``.
    Semantics match reference utils/misc.py:148-165 (tail zero-padded), with
    the fix that ``L < wsize`` pads up to one full window instead of erroring.
    """
    wsize, hsize = int(wsize), int(hsize)
    axis = axis % x.ndim
    n = num_frames(x.shape[axis], wsize, hsize)
    x = pad_axis(x, (n - 1) * hsize + wsize, axis)

    if wsize % hsize == 0:
        # Reshape path: hop-aligned chunks, frames = `overlap` shifted slices.
        overlap = wsize // hsize
        total = (n - 1 + overlap) * hsize
        x = pad_axis(x, total, axis)
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, total)
        x = x[tuple(idx)]
        n_chunks = total // hsize
        new_shape = x.shape[:axis] + (n_chunks, hsize) + x.shape[axis + 1:]
        chunks = x.reshape(new_shape)

        # frames[t] = concat(chunks[t], ..., chunks[t + overlap - 1])
        def slc(j):
            sl = [slice(None)] * chunks.ndim
            sl[axis] = slice(j, j + n)
            return chunks[tuple(sl)]

        return jnp.concatenate([slc(j) for j in range(overlap)], axis=axis + 1)

    starts = jnp.arange(n) * hsize
    idx = starts[:, None] + jnp.arange(wsize)[None, :]
    return jnp.take(x, idx, axis=axis)


def overlap_add(frames: jnp.ndarray, hsize: int) -> jnp.ndarray:
    """Overlap-add frames ``(..., T, W)`` into a signal ``(..., (T-1)*hop + W)``.

    TPU-friendly formulation: frames are zero-padded to a multiple of ``hop``,
    viewed as rows of hop-chunks, and the OLA sum becomes ``overlap`` dense
    shifted adds — no scatter, no per-frame loop.  This replaces the
    reference's per-frame Python loop (transforms/oadd.py:99-101).
    """
    hsize = int(hsize)
    T, W = frames.shape[-2], frames.shape[-1]
    out_len = (T - 1) * hsize + W

    overlap = -(-W // hsize)  # ceil(W / hop)
    Wp = overlap * hsize
    frames = pad_axis(frames, Wp, -1)
    # frames -> (..., T, overlap, hop); chunk j of frame t lands at (t + j) * hop
    chunks = frames.reshape(frames.shape[:-1] + (overlap, hsize))
    total_chunks = T + overlap - 1
    out = jnp.zeros(frames.shape[:-2] + (total_chunks, hsize), frames.dtype)
    for j in range(overlap):
        lane = chunks[..., :, j, :]  # (..., T, hop)
        pads = [(0, 0)] * (lane.ndim - 2) + [(j, overlap - 1 - j), (0, 0)]
        out = out + jnp.pad(lane, pads)
    return out.reshape(frames.shape[:-2] + (total_chunks * hsize,))[..., :out_len]


def reshape_batches(x: jnp.ndarray, event_ndim: int) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """Flatten all leading batch dims before the last ``event_ndim`` dims.

    Returns ``(flat, batch_shape)`` — reference utils/misc.py:168-178 with
    ``dim=-event_ndim``.
    """
    event_ndim = int(event_ndim)
    if event_ndim == 0:
        return x.reshape(-1), x.shape
    batch_shape = x.shape[:-event_ndim]
    event_shape = x.shape[-event_ndim:]
    return x.reshape((-1,) + event_shape), batch_shape
