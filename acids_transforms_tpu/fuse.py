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

from .ops.fft import _resolve_impl, matmul_precision, stft_real
from .transforms.base import AudioTransform, ComposeAudioTransform
from .transforms.raw import Mono
from .transforms.spectral_repr import Magnitude
from .transforms.stft import STFT

__all__ = ["fuse_forward", "fuse_fit", "fusable", "fit_fusable"]


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

    def forward(x: jnp.ndarray) -> jnp.ndarray:
        if mono is not None:
            x = mono.forward(x)
        prec = matmul_precision()
        # direct GEMM: the chunk-DFT factorization (impl="factored") is
        # SLOWER as an XLA graph — its elementwise twiddle/taps chains are
        # HBM-bound (measured 8.9 vs 15.8 M frames/s); it wins only inside
        # the Pallas kernel where intermediates stay in VMEM
        re, im = stft_real(x, n_fft, hop, stft_t.window, impl=stft_t.impl)
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


def _match_fit(chain: AudioTransform):
    """Like :func:`_match_melspec` for the *fit* pass.

    Fit statistics are taken on the non-mel contrasted magnitude
    (the reference ``Magnitude.scale_data`` quirk), so the mel /
    keep_nyquist gates of the forward kernel do not apply — only the
    framing constraints do.
    """
    match = _match_melspec(chain, backend="xla")
    if match is None:
        return None
    mono, stft_t, mag_t = match
    if stft_t.n_fft % stft_t.hop_length != 0:
        return None
    if mono is not None and (mono.normalize or not mono.squeeze):
        return None
    return mono, stft_t, mag_t


def fit_fusable(chain: AudioTransform) -> bool:
    return _match_fit(chain) is not None


def fuse_fit(chain: AudioTransform) -> Callable[[jnp.ndarray], AudioTransform]:
    """Return a one-kernel-pass ``fit`` for a melspec chain.

    The returned callable maps raw audio to a fitted copy of ``chain``
    exactly like ``chain.fit(x)``, but the normalization statistics are
    reduced *inside* the fused Pallas kernel epilogue
    (ops/pallas/spectral.py:fused_melspec_stats): neither the framed signal
    (an ``n_fft/hop``-fold blow-up of the input) nor the spectrogram is ever
    materialized in HBM — only an (8, bins) stats block leaves the chip.
    The XLA fit path cannot express this (its reduction consumer still
    forces the framed GEMM operand out to HBM).

    Chains that don't match the pattern fall back to ``chain.jfit``.
    """
    match = _match_fit(chain)
    if match is None:
        return chain.jfit
    mono, stft_t, mag_t = match
    from .ops.pallas.spectral import fused_melspec_stats
    from .transforms.norm import Normalize

    norm = mag_t.norm
    if not isinstance(norm, Normalize) or norm.mode is None:
        return chain.jfit  # nothing to fit on this pattern

    def fit(x: jnp.ndarray) -> AudioTransform:
        y = mono.forward(x) if mono is not None else x
        flat = y.reshape((-1, y.shape[-1]))
        st = fused_melspec_stats(
            flat,
            stft_t.n_fft,
            stft_t.hop_length,
            stft_t.window,
            mag_t.contrast_mode or "none",
        )
        if norm.mode == "unipolar":
            offset = st["min"]
            scale = st["max"] - st["min"]
        elif norm.mode == "bipolar":
            offset = (st["max"] + st["min"]) / 2.0
            scale = st["max"] - offset
        else:  # gaussian
            n = jnp.asarray(st["count"], jnp.float32)
            offset = st["sum"] / n
            var = jnp.maximum(st["sumsq"] - n * offset * offset, 0.0)
            scale = jnp.sqrt(var / jnp.maximum(n - 1.0, 1.0))
        new_norm = norm.replace(offset=offset, scale=scale)
        new_norm.needs_scaling = False
        new_mag = mag_t.replace(norm=new_norm)
        # Mono/STFT fits are no-ops in the matched pattern; only the
        # Magnitude's norm carries fitted state.
        children = [new_mag if t is mag_t else t for t in chain.transforms]
        return ComposeAudioTransform(transforms=children, sr=chain.sr)

    return fit
