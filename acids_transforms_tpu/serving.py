"""Serving: precompiled, shape-stable execution of transform chains.

Production audio arrives with arbitrary lengths and batch sizes; XLA compiles
one executable per shape.  :class:`CompiledTransform` makes the serving
contract explicit:

* lengths are quantized to a bucket ladder (utils/bucketing.py) and
  zero-padded — at most ``len(buckets) x len(batch_sizes)`` executables ever
  exist, and each is compiled once (optionally ahead of time with
  :meth:`warmup`);
* outputs are trimmed back to the true frame count;
* the underlying jitted callables are plain jax functions, so the wrapper
  composes with device placement / shardings chosen by the caller.

This is the runtime half of the deploy story (export.py is the offline
half): the TorchScript-in-C++-host role of the reference (README.md:58-59)
split into explicit AOT artifacts + a shape-disciplined server.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .fuse import fusable, fuse_forward
from .transforms.base import AudioTransform
from .utils.bucketing import default_buckets

__all__ = ["CompiledTransform"]


class CompiledTransform:
    """Bucketed, precompiled forward/invert server for a fitted transform.

    Example::

        server = CompiledTransform(chain, buckets=(44100, 88200), batch_sizes=(1, 8))
        server.warmup()                      # compile every (bucket, batch) pair
        y = server.forward(x)                # any length/batch <= the ladder maxima

    The chain must preserve the leading batch axis.  Watch the channel
    convention: ``Mono`` interprets dim -2 as channels (reference semantics),
    so a batch of mono signals must be ``(B, 1, L)`` or the chain must not
    start with a channel transform — ``(B, L)`` through ``Mono`` would
    squeeze the batch axis when ``B == 1``.
    """

    def __init__(
        self,
        transform: AudioTransform,
        buckets: Sequence[int] = (),
        batch_sizes: Sequence[int] = (1, 4, 16),
        inversion_mode: Optional[str] = None,
    ):
        self.transform = transform
        self.buckets = tuple(buckets) if buckets else default_buckets(max_seconds=30.0)
        self.batch_sizes = tuple(sorted(batch_sizes))
        self.inversion_mode = inversion_mode
        # recognized mel-spectrogram chains serve through the fused forward
        # (fuse.py: no complex64 intermediate; exact to <1e-4, ~2.5% faster)
        if fusable(transform):
            fused = fuse_forward(transform)
            self._fwd: Callable = jax.jit(lambda t, v: fused(v))
        else:
            self._fwd = jax.jit(lambda t, v: t.forward(v))
        self._inv: Callable = jax.jit(
            lambda t, v: t.invert(v, inversion_mode=inversion_mode),
            static_argnames=(),
        )

    # ------------------------------------------------------------- shaping
    def _bucket(self, n: int) -> int:
        fitting = [b for b in self.buckets if b >= n]
        if not fitting:
            raise ValueError(
                "length %d exceeds the bucket ladder (max %d)" % (n, self.buckets[-1])
            )
        return min(fitting)

    def _batch(self, b: int) -> int:
        fitting = [s for s in self.batch_sizes if s >= b]
        if not fitting:
            raise ValueError(
                "batch %d exceeds configured batch_sizes (max %d)"
                % (b, self.batch_sizes[-1])
            )
        return min(fitting)

    def _pad(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
        b, n = x.shape[0], x.shape[-1]
        bb, nb = self._batch(b), self._bucket(n)
        pads = [(0, bb - b)] + [(0, 0)] * (x.ndim - 2) + [(0, nb - n)]
        return jnp.pad(x, pads), b, n

    # ----------------------------------------------------------------- api
    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward with bucket padding; output trimmed to the true frames.

        Boundary semantics: frames within one window of the true signal end
        see the zero padding instead of the unbucketed reflect padding —
        interior frames are bit-identical to the unpadded forward."""
        xp, b, n = self._pad(x)
        y = self._fwd(self.transform, xp)
        y = y[:b]
        ratio = self.transform.ratio
        if ratio > 1 and y.ndim >= 2:
            t_true = n // ratio + 1
            y = y[..., : min(t_true, y.shape[-2]), :]
        return y

    def invert(self, y: jnp.ndarray) -> jnp.ndarray:
        return self._inv(self.transform, y)

    def warmup(self, channels: Tuple[int, ...] = ()) -> int:
        """Compile every (batch, bucket) forward executable ahead of time.

        Returns the number of variants compiled."""
        count = 0
        for bb in self.batch_sizes:
            for nb in self.buckets:
                shape = (bb,) + tuple(channels) + (nb,)
                self._fwd(self.transform, jnp.zeros(shape, jnp.float32))
                count += 1
        return count
