"""Chain fusion: dispatch recognized transform chains to a fused forward.

``fuse_forward(chain)`` inspects a ``ComposeAudioTransform`` and, when the
structure matches the hot mel-spectrogram pattern

    [Mono?] + STFT + Magnitude

returns a callable that computes the whole pipeline without materializing
the complex spectrogram: the analysis frames feed the cos/sin DFT GEMMs and
the magnitude, mel GEMM, contrast and normalizer epilogue are applied to the
real/imaginary parts directly.  The composable path (``chain.forward``)
round-trips through a complex64 intermediate (STFT's public output); XLA
fuses most of the surrounding elementwise work either way, so the measured
gain is modest — 17.16M vs 16.74M frames/s (+2.5%) on one v5e chip at the
headline shape (n_fft=1024, hop=256, batch=128) — but it is free, exact
(<1e-4 vs the chain, enforced by bench.py's honesty guard) and compiles as
fast as the chain.

Any chain that doesn't match falls back to the jitted ``chain.forward``.

Backends:

- ``"xla"`` (default): the fused-GEMM formulation above; XLA fuses the
  windowing into the GEMM prologue and the epilogue into its consumers.
- ``"pallas"``: the single Pallas kernel (ops/pallas/spectral.py) that also
  keeps framing in VMEM.  Accurate (6.8e-5 vs f64) but loses to XLA's
  pipelined HBM double-buffering at the headline shape (12.6M frames/s), so
  it stays opt-in (``ATT_BENCH_FUSED=1`` in bench.py).  It also requires
  ``hop | n_fft`` and ``keep_nyquist``.

Note: the fused forward is trace-pure — it does not stash forward phase for
``keep_input`` inversion (the eager-only side channel; pass ``phase=``
explicitly, as under any jit).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from .ops.fft import _dft_matrices, _resolve_impl, matmul_precision, spectral_frames
from .transforms.base import AudioTransform, ComposeAudioTransform
from .transforms.raw import Mono
from .transforms.spectral_repr import Magnitude
from .transforms.stft import STFT

__all__ = ["fuse_forward", "fusable"]


def _match_melspec(chain: AudioTransform, backend: str = "xla"):
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
    if _resolve_impl(stft_t.impl, stft_t.n_fft) != "matmul":
        return None  # the fused formulation is the GEMM DFT
    if backend == "pallas":
        # Mosaic kernel constraints (ops/pallas/spectral.py)
        if stft_t.n_fft % stft_t.hop_length != 0:
            return None
        if not mag_t.keep_nyquist:
            return None
        if mono is not None and (mono.normalize or not mono.squeeze):
            return None
    return mono, stft_t, mag_t


def fusable(chain: AudioTransform, backend: str = "xla") -> bool:
    return _match_melspec(chain, backend) is not None


def _xla_fused(mono: Optional[Mono], stft_t: STFT, mag_t: Magnitude):
    n_fft, hop = stft_t.n_fft, stft_t.hop_length
    C, S = _dft_matrices(n_fft)
    C, S = jnp.asarray(C), jnp.asarray(S)

    def forward(x: jnp.ndarray) -> jnp.ndarray:
        if mono is not None:
            x = mono.forward(x)
        prec = matmul_precision()
        fw = spectral_frames(x, n_fft, hop, stft_t.window)
        re = jnp.matmul(fw, C, precision=prec)
        im = jnp.matmul(fw, S, precision=prec)
        mag = jnp.sqrt(re * re + im * im)
        if mag_t.mel:
            mag = jnp.matmul(mag, mag_t.mel_bank, precision=prec)
        mag = mag_t.contrast(mag)
        mag = mag_t.norm.forward(mag)
        return mag_t._drop_nyquist(mag)

    return forward


def _pallas_fused(mono: Optional[Mono], stft_t: STFT, mag_t: Magnitude):
    from .ops.pallas.spectral import fused_melspec
    from .transforms.norm import Normalize

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


def fuse_forward(
    chain: AudioTransform, backend: str = "xla"
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Return the fastest available forward for ``chain`` (see module docs)."""
    if backend not in ("xla", "pallas"):
        raise ValueError("unknown fuse backend %r" % backend)
    match = _match_melspec(chain, backend)
    if match is None:
        return chain.jforward
    mono, stft_t, mag_t = match
    if backend == "pallas":
        return _pallas_fused(mono, stft_t, mag_t)
    return _xla_fused(mono, stft_t, mag_t)
