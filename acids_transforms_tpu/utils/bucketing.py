"""Variable-length audio under jit: pad-to-bucket + mask.

XLA compiles one executable per shape; feeding arbitrary-length audio would
recompile constantly.  Policy (SURVEY.md §7 hard part 5): quantize lengths to
a small set of buckets, zero-pad up, carry a sample mask.  Mirrors the
reference's pad-and-stack ingestion (reference utils/misc.py:45-56) but makes
the contract explicit.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["default_buckets", "pad_to_bucket", "frame_mask"]


def default_buckets(
    min_seconds: float = 0.25, max_seconds: float = 60.0, sr: int = 44100, factor: float = 1.5
) -> Tuple[int, ...]:
    """Geometric bucket ladder in samples (each ~``factor`` x the previous)."""
    out = []
    n = int(min_seconds * sr)
    stop = int(max_seconds * sr)
    while n < stop:
        out.append(n)
        n = int(n * factor)
    out.append(stop)
    return tuple(out)


def pad_to_bucket(
    x: np.ndarray, buckets: Sequence[int] = ()
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Zero-pad the last axis of ``x`` up to the smallest bucket >= its length.

    Returns ``(padded, mask, bucket)`` where ``mask (..., bucket)`` is 1 over
    real samples.  With the default ladder, at most ``len(buckets)`` distinct
    shapes (hence compilations) ever exist.
    """
    if not buckets:
        buckets = default_buckets()
    L = x.shape[-1]
    fitting = [b for b in buckets if b >= L]
    bucket = min(fitting) if fitting else -(-L // buckets[-1]) * buckets[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, bucket - L)]
    padded = jnp.asarray(np.pad(np.asarray(x), pad))
    mask = jnp.zeros(x.shape[:-1] + (bucket,), jnp.float32).at[..., :L].set(1.0)
    return padded, mask, int(bucket)


def frame_mask(sample_mask: jnp.ndarray, wsize: int, hsize: int) -> jnp.ndarray:
    """Downsample a sample mask to a per-frame validity mask: a frame is valid
    iff its *first* sample is real (matches the framing tail-padding
    convention in ops/framing.py)."""
    n = max((sample_mask.shape[-1] - wsize) // hsize, 0) + 1
    starts = jnp.arange(n) * hsize
    return jnp.take(sample_mask, starts, axis=-1)
