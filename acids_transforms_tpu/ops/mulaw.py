"""Mu-law companding (reference transforms/raw.py:282-283 via
``torchaudio.transforms.MuLawEncoding/MuLawDecoding``).

Closed-form, fully elementwise — fuses into surrounding XLA computation.
Input is expected in [-1, 1] (torchaudio convention).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mulaw_encode", "mulaw_decode"]


def mulaw_encode(x: jnp.ndarray, quantization_channels: int = 256) -> jnp.ndarray:
    """Encode a [-1, 1] signal to integer mu-law codes in [0, channels)."""
    mu = quantization_channels - 1.0
    x = x.astype(jnp.float32)
    fx = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    return ((fx + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)


def mulaw_decode(codes: jnp.ndarray, quantization_channels: int = 256) -> jnp.ndarray:
    """Decode integer mu-law codes back to a [-1, 1] float signal."""
    mu = quantization_channels - 1.0
    x = codes.astype(jnp.float32)
    x = (x / mu) * 2.0 - 1.0
    return jnp.sign(x) / mu * (jnp.power(1.0 + mu, jnp.abs(x)) - 1.0)
