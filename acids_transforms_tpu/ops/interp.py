"""Linear resampling matching ``torch.nn.functional.interpolate(mode="linear",
align_corners=False)`` — used by the sinebank inversion's envelope upsampling
(reference transforms/stft.py:187).

Expressed as a gather + lerp with static index tables; batched over leading
dims for free.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["interp_linear"]


def interp_linear(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Resample the last axis of ``x`` to ``out_size`` samples.

    Half-pixel (align_corners=False) convention:
    ``src = clamp((dst + 0.5) * in/out - 0.5, 0, in - 1)``.
    """
    in_size = x.shape[-1]
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)

    x_lo = jnp.take(x, jnp.asarray(lo), axis=-1)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=-1)
    w = jnp.asarray(w_hi)
    return x_lo * (1.0 - w) + x_hi * w
