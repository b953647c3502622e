"""Scalar affine normalization with a jit-compiled statistics pass.

Reference: acids_transforms/transforms/norm.py:12-99.  The reference mutates
``offset`` / ``scale`` buffers in ``scale_data``; here the primitive is the
pure ``fit(x) -> Normalize`` (one fused reduction pass under jit), with
``scale_data`` kept as the eager in-place convenience.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .base import AudioTransform

__all__ = ["Normalize"]

NORMALIZATION_MODES = ("unipolar", "bipolar", "gaussian")


class Normalize(AudioTransform):
    """Affine normalizer: ``forward = (x - offset) / scale``.

    Fitting modes (reference norm.py:25-38):

    * ``unipolar`` — min-max to [0, 1]
    * ``bipolar``  — symmetric min-max to [-1, 1]
    * ``gaussian`` — z-score (mean / std, unbiased std as in torch)
    """

    scriptable = True
    _leaves = ("offset", "scale")

    def __init__(self, mode: Optional[str] = "gaussian", sr: int = 44100):
        super().__init__(sr=sr)
        if mode is not None and mode not in NORMALIZATION_MODES:
            raise ValueError("unknown normalization mode %r" % mode)
        self.mode = mode
        self.needs_scaling = True
        self.offset = jnp.zeros(())
        self.scale = jnp.ones(())

    def get_normalization_modes(self):
        return list(NORMALIZATION_MODES)

    def fit(self, x: jnp.ndarray, mask=None) -> "Normalize":
        """Fit stats on ``x``; with ``mask`` (broadcastable, 1 = real data)
        padded elements are excluded, so bucket-padded batches fit exactly
        like their unpadded originals (tests/test_serving.py)."""
        if mask is None:
            valid = None
        else:
            valid = jnp.broadcast_to(mask > 0, x.shape)

        def _min(v):
            return v.min() if valid is None else jnp.where(valid, v, jnp.inf).min()

        def _max(v):
            return v.max() if valid is None else jnp.where(valid, v, -jnp.inf).max()

        if self.mode == "unipolar":
            offset = _min(x)
            scale = _max(x - offset)
        elif self.mode == "bipolar":
            x_min, x_max = _min(x), _max(x)
            offset = (x_max + x_min) / 2.0
            scale = x_max - offset
        elif self.mode == "gaussian":
            if valid is None:
                offset = x.mean()
                scale = jnp.std(x, ddof=1)
            else:
                n = valid.sum().astype(x.dtype)
                offset = jnp.where(valid, x, 0.0).sum() / n
                ss = jnp.where(valid, (x - offset) ** 2, 0.0).sum()
                scale = jnp.sqrt(ss / jnp.maximum(n - 1.0, 1.0))
        else:  # mode None: identity
            offset = jnp.zeros((), x.dtype)
            scale = jnp.ones((), x.dtype)
        new = self.replace(offset=offset, scale=scale)
        new.needs_scaling = False
        return new

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.offset) / self.scale

    def invert(self, x, inversion_mode=None, key=None):
        return x * self.scale + self.offset
