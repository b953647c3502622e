"""Chain fusion: dispatch recognized transform chains to Pallas kernels.

``fuse_forward(chain)`` inspects a ``ComposeAudioTransform`` and, when the
structure matches the hot mel-spectrogram pattern

    [Mono?] + STFT + Magnitude

returns a callable backed by the single fused Pallas kernel
(ops/pallas/spectral.py), which keeps framing and all intermediates in VMEM.
Any other chain falls back to the jitted ``chain.forward``.

Status: opt-in.  The compiled kernel is accurate (6.8e-5 vs float64, on par
with the XLA chain's 8.1e-5) but ~25% slower at n_fft=1024 (12.6M vs 16.7M
frames/s): XLA's pipelined HBM double-buffering beats both the hop-chunk-dot
and the scratch-assembled full-K kernel variants (see BENCH_NOTES.md).  The
XLA chain stays the default and this dispatcher is enabled explicitly
(``ATT_BENCH_FUSED=1`` in bench.py).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from .ops.pallas.spectral import fused_melspec
from .transforms.base import AudioTransform, ComposeAudioTransform
from .transforms.norm import Normalize
from .transforms.raw import Mono
from .transforms.spectral_repr import Magnitude
from .transforms.stft import STFT

__all__ = ["fuse_forward", "fusable"]


def _match_melspec(chain: AudioTransform):
    """Return (mono, stft, magnitude) if the chain matches, else None."""
    if not isinstance(chain, ComposeAudioTransform):
        return None
    ts = list(chain.transforms)
    mono = None
    if ts and type(ts[0]) is Mono:
        mono = ts[0]
        ts = ts[1:]
    if len(ts) != 2:
        return None
    stft_t, mag_t = ts
    if type(stft_t) is not STFT or type(mag_t) is not Magnitude:
        return None
    if stft_t.n_fft % stft_t.hop_length != 0:
        return None
    if not mag_t.keep_nyquist:
        return None
    if mono is not None and (mono.normalize or not mono.squeeze):
        return None
    return mono, stft_t, mag_t


def fusable(chain: AudioTransform) -> bool:
    return _match_melspec(chain) is not None


def fuse_forward(chain: AudioTransform) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Return the fastest available forward for ``chain`` (see module docs)."""
    match = _match_melspec(chain)
    if match is None:
        return chain.jforward
    mono, stft_t, mag_t = match

    norm = mag_t.norm
    if isinstance(norm, Normalize):
        offset = float(norm.offset)
        scale = float(norm.scale)
    else:  # Dummy
        offset, scale = 0.0, 1.0
    contrast = mag_t.contrast_mode or "none"
    mel_bank = mag_t.mel_bank if mag_t.mel else None

    def forward(x: jnp.ndarray) -> jnp.ndarray:
        if mono is not None:
            x = mono.forward(x)
        batch_shape = x.shape[:-1]
        flat = x.reshape((-1, x.shape[-1]))
        y = fused_melspec(
            flat,
            stft_t.n_fft,
            stft_t.hop_length,
            stft_t.window,
            mel_bank,
            offset,
            scale,
            contrast,
        )
        return y.reshape(batch_shape + y.shape[1:])

    return forward
