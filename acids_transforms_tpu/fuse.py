"""Chain fusion: dispatch recognized transform chains to a fused forward.

``fuse_forward(chain)`` inspects a ``ComposeAudioTransform`` and, when the
structure matches the hot mel-spectrogram pattern

    [Mono?] + STFT + Magnitude

returns a callable that computes the whole pipeline without materializing
the complex spectrogram.  Any chain that doesn't match falls back to the
jitted ``chain.forward``.

Backends (all <1e-4 vs the chain, enforced by bench.py's honesty guard;
v5e figures at the headline shape n_fft=1024, hop=256, batch=128):

- ``"auto"`` (default): the measured winner — the chunk-factored Pallas
  kernel inside its winning region (TPU, cosine-sum window, overlap >= 2,
  512 <= n_fft <= 4096, bounded-amplification contrast), the full-K kernel
  for non-cosine windows in the nyquist-depadded region (see below), else
  the XLA fused GEMM.
- ``"pallas"``: one Mosaic kernel (ops/pallas/spectral.py).  For cosine-sum
  windows (hann/hamming/blackman) it runs the chunk-DFT factorization —
  K=hop chunk GEMMs reused across overlapping frames + exact twiddle
  combine + P-tap spectral window conv, all intermediates in VMEM —
  **29.4M frames/s vs 15.6M** for the XLA fused path (1.88x at the headline
  shape, r3.6 depadded), 6.5e-5 vs the HIGH-precision chain.  The same
  factorization as an XLA graph is HBM-bound and *loses* 1.8x
  (``impl="factored"``, ops/fft.py) — the kernel is what makes the FLOP
  saving real.  Non-cosine windows (the DGT gaussian) use the full-K
  windowed kernel: since the r3.6 nyquist-depadded lane layout
  (ops/pallas/spectral.py:_nyq_depad) it beats XLA too — 17.8M vs 15.6M
  (1.14x) at 1024/256, 1.32x at 2048/512 — so auto picks it for
  256-multiple n_fft up to 2048.  Requires ``hop | n_fft``; declines
  ``log``/``log10`` contrasts (unbounded error amplification near silent
  bins).
- ``"xla"``: the fused-GEMM formulation — analysis frames feed the cos/sin
  DFT GEMMs; magnitude, mel GEMM, contrast and normalizer epilogue fuse
  onto the real/imaginary parts (15.7M frames/s; the composable
  ``chain.forward`` with its complex64 intermediate is ~2.5% slower).

``fuse_fit`` is the same story for the *fit* pass: the kernel's stats
epilogue reduces the normalization statistics on-chip (30.0M vs 17.3M
frames/s, +73%) — see :func:`fuse_fit`.

``[Mono?] + MFCC`` chains (and bare ``MFCC`` transforms — the reference's
MelSpectrogram: power spectrogram -> mel GEMM, bin-major output) dispatch
to the same kernel with ``power=2`` (no sqrt) and the 128-mel bank:
**31.2M frames/s vs 18.9M** for the XLA fusion (+65%), 1.8e-5.

Note: the fused forward is trace-pure — it does not stash forward phase for
``keep_input`` inversion (the eager-only side channel; pass ``phase=``
explicitly, as under any jit).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

import numpy as np

from .ops.fft import _resolve_impl, matmul_precision, stft_real, taps_for_window
from .transforms.base import AudioTransform, ComposeAudioTransform
from .transforms.dgt import DGT
from .transforms.raw import Mono
from .transforms.spectral_repr import Magnitude
from .transforms.stft import STFT

__all__ = ["fuse_forward", "fuse_fit", "fusable", "fit_fusable"]


def _from_pcm(x: jnp.ndarray) -> jnp.ndarray:
    """int16 PCM -> float32 at the ``import_data`` convention (x / 32768).

    Exact: int16->f32 is lossless and the power-of-two scale only shifts
    exponents, so everything downstream is bit-identical to feeding the
    pre-converted float array."""
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) * 2.0 ** -15
    return x


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
    # offline STFT or DGT (the DGT's gaussian window rides the same fused
    # formulation via the window leaf); realtime subclasses take frames,
    # not signals, and never match
    if type(stft_t) not in (STFT, DGT) or type(mag_t) is not Magnitude:
        return None
    if _resolve_impl(stft_t.impl, stft_t.n_fft) != "matmul":
        return None  # the fused formulation is the GEMM DFT
    if mag_t.mel and mag_t.n_fft != stft_t.n_fft:
        # mismatched bank: let the chain raise its own matmul shape error —
        # the Pallas path would otherwise zero-pad the short bank and
        # return silently wrong features (fused_melspec pads weights)
        return None
    if backend == "pallas":
        # Mosaic kernel constraints (ops/pallas/spectral.py); Mono options
        # and the nyquist drop run outside the kernel
        if stft_t.n_fft % stft_t.hop_length != 0:
            return None
        # "log"/"log10" amplify the kernel's ~5e-5 bf16x3 magnitude error
        # unboundedly near silent bins (log of ~eps); only contrasts with
        # bounded error amplification keep the <1e-4 output guarantee
        if mag_t.contrast_mode in ("log", "log10"):
            return None
    return mono, stft_t, mag_t


def fusable(chain: AudioTransform, backend: str = "auto") -> bool:
    if _match_mfcc(chain) is not None:
        return True
    if backend == "auto":
        if _match_melspec(chain, "xla") is not None:
            return True
        return _match_repr(chain, "xla") is not None
    if _match_melspec(chain, backend) is not None:
        return True
    return _match_repr(chain, backend) is not None


def _from_pcm_for_mono(mono: Mono, x: jnp.ndarray) -> jnp.ndarray:
    """int16 PCM entering a ``Mono`` stage: mixing/normalizing needs float
    arithmetic, so convert up front; every other Mono config is a
    slice/squeeze (dtype-preserving), so the PCM dtype survives to the
    kernel's in-kernel convert and its halved input DMA."""
    if x.dtype == jnp.int16 and (
        mono.normalize
        or (x.ndim >= 2 and x.shape[-2] == 2 and mono.mode == "mix")
    ):
        return _from_pcm(x)
    return x


def _mel_blocks_for(mag_t: Magnitude):
    """Banded-block structure of the transform's mel bank, tracer-safe.

    When the bank leaf is concrete the structure is computed from the
    ACTUAL bank (a user may have swapped the leaf for a custom filterbank —
    skipping blocks the default config predicts empty would silently zero
    its contributions); only under serving's jit, where the leaf is a
    tracer the factory can't inspect, does the static default-config
    structure serve (leaf swaps through serving must keep the default band
    structure — see ``serving.refresh()``)."""
    import jax

    from .ops.pallas.spectral import mel_block_structure

    if isinstance(mag_t.mel_bank, jax.core.Tracer):
        from .ops.mel import square_mel_banks

        bank_np = square_mel_banks(
            mag_t.n_fft, mag_t.sr, keep_nyquist=mag_t.keep_nyquist,
            inverse=getattr(mag_t, "mel_inverse", "transpose"),
        )[0]
        return mel_block_structure(bank_np)
    return mel_block_structure(np.asarray(mag_t.mel_bank))


def _xla_fused(
    mono: Optional[Mono], stft_t: STFT, mag_t: Magnitude,
    out_dtype=jnp.float32,
):
    n_fft, hop = stft_t.n_fft, stft_t.hop_length

    def forward(x: jnp.ndarray) -> jnp.ndarray:
        x = _from_pcm(x)
        if mono is not None:
            x = mono.forward(x)
        prec = matmul_precision()
        # direct GEMM: the chunk-DFT factorization (impl="factored") is
        # SLOWER as an XLA graph — its elementwise twiddle/taps chains are
        # HBM-bound (measured 8.9 vs 15.8 M frames/s); it wins only inside
        # the Pallas kernel where intermediates stay in VMEM.  taps must be
        # forwarded: impl="factored" raises without them (chain.forward
        # passes the transform's own _window_taps).
        re, im = stft_real(
            x, n_fft, hop, stft_t.window, impl=stft_t.impl,
            taps=getattr(stft_t, "_window_taps", None),
        )
        # tiny floor keeps the VJP finite at silent bins (d sqrt(0) = inf);
        # forward impact is sqrt(tiny) ~ 1e-19, far inside the 1e-4 budget
        mag = jnp.sqrt(jnp.maximum(re * re + im * im, jnp.finfo(jnp.float32).tiny))
        if mag_t.mel:
            mag = jnp.matmul(mag, mag_t.mel_bank, precision=prec)
        mag = mag_t.contrast(mag)
        mag = mag_t.norm.forward(mag)
        return mag_t._drop_nyquist(mag).astype(out_dtype)

    return forward


def _pallas_fused(
    mono: Optional[Mono], stft_t: STFT, mag_t: Magnitude,
    out_dtype=jnp.float32,
):
    import jax

    from .ops.pallas.spectral import fused_melspec
    from .transforms.norm import Normalize

    norm = mag_t.norm
    if isinstance(norm, Normalize):
        # keep as (possibly traced) scalars — under serving's jit the
        # transform is a pytree ARGUMENT and float() would concretize
        offset = norm.offset
        scale = norm.scale
    else:  # Dummy
        offset, scale = 0.0, 1.0
    contrast = mag_t.contrast_mode or "none"
    mel_bank = mag_t.mel_bank if mag_t.mel else None

    taps = getattr(stft_t, "_window_taps", None)

    # banded-block mel structure — the square bank is bidiagonal, so the
    # kernel skips ~2/3 of its mel GEMM blocks exactly
    # (ops/pallas/spectral.py:_mel3); tracer-safe via _mel_blocks_for
    mel_blocks = _mel_blocks_for(mag_t) if mag_t.mel else None

    def kernel_forward(x: jnp.ndarray) -> jnp.ndarray:
        if mono is not None:
            x = mono.forward(_from_pcm_for_mono(mono, x))
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
            taps=taps,
            mel_blocks=mel_blocks,
            # 4th bf16 product in both GEMM stages at 4096: the bf16x3
            # residuals are what pushed 4096/overlap>4 past the 1e-4
            # budget after the norm-shrinking log contrast; +1/3 GEMM MACs
            # buys the accuracy back (BENCH_NOTES.md 4096 note).  Factored
            # path only: the full-K single-GEMM path has no twiddle-combine
            # error accumulation and measures 7.8e-5 at 4096 without x4
            # (gaussian, f64 oracle) — x4 would only cost MACs there.
            x4=stft_t.n_fft >= 4096 and taps is not None,
            # in-kernel store dtype: bf16 halves the output DMA (the
            # dominant term of the kernel's bandwidth floor) and is
            # bit-identical to rounding the f32 result
            out_dtype=out_dtype,
        )
        return mag_t._drop_nyquist(y.reshape(batch_shape + y.shape[1:]))

    # pallas_call defines no AD rules; keep the fused forward differentiable
    # (spectral-loss training through the serving path) by pairing the kernel
    # primal with the mathematically-identical XLA formulation's VJP
    xla_forward = _xla_fused(mono, stft_t, mag_t, out_dtype=out_dtype)

    @jax.custom_vjp
    def forward(x: jnp.ndarray) -> jnp.ndarray:
        return kernel_forward(x)

    def _fwd(x):
        return kernel_forward(x), x

    def _bwd(x, g):
        _, vjp = jax.vjp(xla_forward, x)
        return vjp(g)

    forward.defvjp(_fwd, _bwd)
    return forward


def _match_mfcc(chain: AudioTransform):
    """Return (mono, mfcc) for ``[Mono?] + MFCC`` chains (or a bare MFCC).

    The reference's "MFCC" is a MelSpectrogram (power spectrogram -> mel
    GEMM, bin-major output); its whole forward maps onto the fused kernel
    with ``power=2`` and no contrast.  The optional true-DCT extension
    (``n_mfcc``) and non-GEMM impls fall back.
    """
    from .transforms.mel import MFCC

    mono = None
    if isinstance(chain, ComposeAudioTransform):
        ts = list(chain.transforms)
        if ts and type(ts[0]) is Mono:
            mono = ts[0]
            ts = ts[1:]
        if len(ts) != 1:
            return None
        chain = ts[0]
    if type(chain) is not MFCC:
        return None
    if chain.n_mfcc or chain.power not in (1.0, 2.0):
        return None
    if _resolve_impl(chain.impl, chain.n_fft) != "matmul":
        return None
    if chain.n_fft % chain.hop_length != 0:
        return None
    return mono, chain


def _fused_mfcc(mono, mfcc, backend: str, out_dtype=jnp.float32):
    from .ops.pallas.spectral import fused_melspec

    # MFCC's window is always hann (transforms/mel.py ctor); rebuild it in
    # pure numpy — under a jit trace (serving) both the window *leaf* and
    # any jnp-constructed constant are tracers
    k = np.arange(mfcc.n_fft)
    w_np = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / mfcc.n_fft)
    taps = taps_for_window(w_np)

    def forward(x: jnp.ndarray) -> jnp.ndarray:
        if mono is not None:
            x = mono.forward(_from_pcm_for_mono(mono, x))
        if backend == "pallas":
            batch_shape = x.shape[:-1]
            flat = x.reshape((-1, x.shape[-1]))
            mel = fused_melspec(
                flat, mfcc.n_fft, mfcc.hop_length, mfcc.window,
                mfcc.mel_bank, 0.0, 1.0, "none", taps=taps, power=mfcc.power,
            )
            mel = mel.reshape(batch_shape + mel.shape[1:])
        else:
            re, im = stft_real(
                _from_pcm(x), mfcc.n_fft, mfcc.hop_length, mfcc.window,
                impl=mfcc.impl, taps=taps,
            )
            sq = re * re + im * im
            p = sq if mfcc.power == 2.0 else jnp.sqrt(sq)
            mel = jnp.matmul(p, mfcc.mel_bank, precision=matmul_precision())
        mel = jnp.swapaxes(mel, -2, -1)  # torchaudio bin-major layout
        if mfcc.norm is not None:
            mel = mfcc.norm.forward(mel)
        # final-cast only (the post-kernel norm/transpose must run in f32);
        # XLA fuses the cast into the producing op, so the f32 intermediate
        # never hits HBM
        return mel.astype(out_dtype)

    return forward


def _match_repr(chain: AudioTransform, backend: str = "xla"):
    """Return ``(mono, stft_t, rep, second)`` for a fusable stacked
    spectral-representation chain ``[Mono?] + (STFT|DGT) + (Polar|PolarIF|
    Cartesian)``, else None.

    ``second`` is the kernel's channel-2 selector: "phase" (Polar, requires
    ``unwrap=False`` — unwrapping is a global frame cumsum), "if" (PolarIF,
    requires the default ``method="forward"`` — the only stencil whose
    boundary rows are frame-local; backward/central pass the *globally
    unwrapped* last frame through, reference spectral_repr.py:316-335), or
    "imag" (Cartesian).
    """
    from .transforms.spectral_repr import Cartesian, Polar, PolarIF

    if not isinstance(chain, ComposeAudioTransform):
        return None
    ts = list(chain.transforms)
    mono = None
    if ts and type(ts[0]) is Mono:
        mono = ts[0]
        ts = ts[1:]
    if len(ts) != 2:
        return None
    stft_t, rep = ts
    if type(stft_t) not in (STFT, DGT):
        return None
    if type(rep) not in (Polar, PolarIF, Cartesian):
        return None
    if _resolve_impl(stft_t.impl, stft_t.n_fft) != "matmul":
        return None
    if rep.stack is not None and not (
        isinstance(rep.stack, int) and rep.stack < 0
    ):
        return None  # front-counted stack dims depend on batch rank
    if type(rep) is Cartesian:
        second = "imag"
    elif type(rep) is Polar:
        if getattr(rep.phase, "unwrap", False):
            return None
        second = "phase"
    else:
        if rep.phase.method != "forward":
            return None
        second = "if"
    if second != "imag":
        mag_t = rep.magnitude
        if mag_t.mel and mag_t.n_fft != stft_t.n_fft:
            return None  # mismatched bank: let the chain raise its own error
        if backend == "pallas":
            if stft_t.n_fft % stft_t.hop_length != 0:
                return None
            if mag_t.contrast_mode in ("log", "log10"):
                return None
    elif backend == "pallas" and stft_t.n_fft % stft_t.hop_length != 0:
        return None
    return mono, stft_t, rep, second


def _norm_affine(norm):
    """(offset, scale) of a Normalize / Dummy leaf, traced-safe."""
    from .transforms.norm import Normalize

    if isinstance(norm, Normalize):
        return norm.offset, norm.scale
    return 0.0, 1.0


def _stack_repr(rep, y1, y2):
    if rep.stack is None:
        return y1, y2
    return jnp.stack([y1, y2], axis=rep.stack)


def _xla_fused_repr(mono, stft_t, rep, second):
    """XLA-fused two-channel representation forward: real/imag GEMMs feed
    both channel epilogues directly — the complex spectrogram intermediate
    of ``chain.forward`` never materializes.  Channel math is the
    transforms' own (shared code paths), so output parity with the chain
    is exact up to XLA fusion reassociation."""
    n_fft, hop = stft_t.n_fft, stft_t.hop_length

    def forward(x: jnp.ndarray):
        x = _from_pcm(x)
        if mono is not None:
            x = mono.forward(x)
        re, im = stft_real(
            x, n_fft, hop, stft_t.window, impl=stft_t.impl,
            taps=getattr(stft_t, "_window_taps", None),
        )
        if second == "imag":
            y1 = rep.magnitude._drop_nyquist(rep.magnitude.norm.forward(re))
            y2 = rep.phase._drop_nyquist(rep.phase.norm.forward(im))
            return _stack_repr(rep, y1, y2)
        mag_t = rep.magnitude
        prec = matmul_precision()
        mag = jnp.sqrt(
            jnp.maximum(re * re + im * im, jnp.finfo(jnp.float32).tiny)
        )
        if mag_t.mel:
            mag = jnp.matmul(mag, mag_t.mel_bank, precision=prec)
        y1 = mag_t._drop_nyquist(mag_t.norm.forward(mag_t.contrast(mag)))
        ph = jnp.arctan2(im, re)
        if second == "phase":
            y2 = ph
        else:
            y2 = rep.phase.get_if_from_phase(ph)
        y2 = rep.phase._drop_nyquist(rep.phase.norm.forward(y2))
        return _stack_repr(rep, y1, y2)

    return forward


def _pallas_fused_repr(mono, stft_t, rep, second):
    """One-kernel two-channel representation forward
    (ops/pallas/spectral.py:fused_spectral_repr); differentiable via the
    XLA formulation's VJP, exactly like :func:`_pallas_fused`."""
    import jax

    from .ops.pallas.spectral import fused_spectral_repr

    o1, s1 = _norm_affine(rep.magnitude.norm)
    o2, s2 = _norm_affine(rep.phase.norm)
    if second == "imag":
        contrast = "none"
        mel_bank = None
        weighted = False
    else:
        mag_t = rep.magnitude
        contrast = mag_t.contrast_mode or "none"
        mel_bank = mag_t.mel_bank if mag_t.mel else None
        weighted = bool(getattr(rep.phase, "weighted", False))
    taps = getattr(stft_t, "_window_taps", None)

    mel_blocks = _mel_blocks_for(rep.magnitude) if mel_bank is not None else None

    def kernel_forward(x: jnp.ndarray):
        if mono is not None:
            x = mono.forward(_from_pcm_for_mono(mono, x))
        batch_shape = x.shape[:-1]
        flat = x.reshape((-1, x.shape[-1]))
        y1, y2 = fused_spectral_repr(
            flat,
            stft_t.n_fft,
            stft_t.hop_length,
            stft_t.window,
            second,
            mel_bank=mel_bank,
            aff=(o1, s1, o2, s2),
            contrast=contrast,
            weighted=weighted,
            taps=taps,
            mel_blocks=mel_blocks,
            x4=stft_t.n_fft >= 4096 and taps is not None,
        )
        y1 = rep.magnitude._drop_nyquist(y1.reshape(batch_shape + y1.shape[1:]))
        y2 = rep.phase._drop_nyquist(y2.reshape(batch_shape + y2.shape[1:]))
        return _stack_repr(rep, y1, y2)

    xla_forward = _xla_fused_repr(mono, stft_t, rep, second)

    @jax.custom_vjp
    def forward(x: jnp.ndarray):
        return kernel_forward(x)

    def _fwd(x):
        return kernel_forward(x), x

    def _bwd(x, g):
        _, vjp = jax.vjp(xla_forward, x)
        return vjp(g)

    forward.defvjp(_fwd, _bwd)
    return forward


def _repr_pallas_preferred(chain: AudioTransform) -> bool:
    """Auto region for the fused representation kernel, measured per
    representation (tools/sweep_repr.py / sweep_repr2.py, v5e):

    - PolarIF ("if"): the kernel wins 2.0-3.3x at EVERY swept shape (512,
      1024, 2048 taps; 1024 full-K) because the XLA path pays a global
      ``unwrap`` frame cumsum the frame-local stencil eliminates — auto
      accepts the whole kernel availability region.
    - Polar ("phase") / Cartesian ("imag"): the win rides on DFT reuse
      alone and grows with n_fft — taps 1024 (1.27x / 1.14x), 2048
      (2.18x / 2.06x) and 4096 with the x4 split (2.26x / 2.38x; PolarIF
      2.95x) win; 512 (0.97x / 0.80x) and the DGT full-K at 1024
      (0.97x / 0.81x) lose — auto accepts taps windows at
      1024 <= n_fft <= 4096.

    Accuracy across the region is oracle-validated (tools/oracle_repr.py):
    the kernel-vs-chain diff (1.3e-4 at 1024 bipolar) is the sum of two
    independent ~5e-5 errors, and the kernel lands at least as close to
    the float64 reference as the chain on both channels (at 4096/x4:
    mag 9.9e-7 vs 7.9e-6, phase 9.4e-7 vs 1.3e-6, IF both under 4e-6)."""
    import jax

    if jax.default_backend() != "tpu":
        return False
    match = _match_repr(chain, "pallas")
    if match is None:
        return False
    stft_t, second = match[1], match[3]
    from .regions import repr_region_ok

    return repr_region_ok(
        stft_t.n_fft,
        stft_t.hop_length,
        getattr(stft_t, "_window_taps", None) is not None,
        second,
    )


def _pallas_region_ok(stft_t) -> bool:
    """The measured-winner shape region shared by every fused forward
    (see :func:`_pallas_preferred` for the measurements; values load from
    dispatch_regions.json via regions.py — the single source of truth)."""
    from .regions import melspec_region_ok

    return melspec_region_ok(
        stft_t.n_fft,
        stft_t.hop_length,
        getattr(stft_t, "_window_taps", None) is not None,
    )


def _pallas_preferred(chain: AudioTransform) -> bool:
    """True when the chunk-factored Pallas kernel is the measured winner:
    on a TPU (elsewhere the kernel runs in interpret mode), pattern-fusable
    under the Mosaic constraints, and the analysis window a cosine sum
    (without taps the full-K kernel loses to XLA).

    Since the r3 kernel rework (single stacked bf16x3 GEMM, banded-block
    mel, single-copy padding) the kernel beats the XLA fused path at EVERY
    swept shape — 1.13x (512/128) to 2.48x (2048/512), 1.73x at the
    headline 1024/256 (BENCH_NOTES.md r3 sweep) — so the auto region is now
    bounded only by accuracy: every accepted shape is validated <= ~1e-4
    against a float64 oracle.  At 4096 the mel GEMM rides the 4-product
    bf16 split (``_mel3(x4=True)``, +1/3 mel MACs), which brings the
    overlap > 4 region from 1.02e-4 to well under budget — the whole
    512..4096, overlap >= 2 family is auto-accepted."""
    import jax

    if jax.default_backend() != "tpu":
        return False
    match = _match_melspec(chain, "pallas")
    if match is None:
        return False
    # non-cosine windows (the DGT gaussian) ride the full-K kernel.  It
    # beats the XLA fused path only with the nyquist-depadded lane layout
    # (r3.6): measured 1.14x at 1024/256 b128 and 1.32x at 2048/512 b64
    # (tools/sweep_depad.py; pre-depad it LOST by 1.7%, BENCH_NOTES.md).
    # 4096 full-K runs (the r3.6c no-dup [B_hi; B_lo] operand layout
    # brings the basis under the VMEM roof) but measures only 1.07x over
    # XLA at 1.34e-4 vs the chain — over the mutual 1e-4 budget and
    # inside run noise — so auto keeps 4096 gaussian on XLA (measured
    # negative, BENCH_NOTES.md).  _pallas_region_ok encodes the region.
    return _pallas_region_ok(match[1])


def fuse_forward(
    chain: AudioTransform,
    backend: str = "auto",
    out_dtype=jnp.float32,
    mesh=None,
    shard_axis: str = "data",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Return the fastest available forward for ``chain`` (see module docs).

    ``backend="auto"`` (default) dispatches to the chunk-factored Pallas
    kernel when it is the measured winner (TPU + cosine-sum window: 19.1M
    vs 15.7M frames/s for the XLA fused path at the headline shape), else
    the XLA fused GEMM formulation, else ``chain.jforward``.

    ``out_dtype`` (default f32) is the dtype of the returned features.
    ``jnp.bfloat16`` is the training-pipeline contract: all arithmetic
    stays f32/bf16x3 and only the final store rounds
    (round-to-nearest-even), exactly ``forward(x).astype(bfloat16)`` —
    on the Pallas melspec path the rounding happens in the kernel's HBM
    store, halving the output DMA (measured +6% at the headline shape,
    BENCH_NOTES.md).  The library's 1e-4 accuracy budget is an f32-output
    statement; bf16's ~3.9e-3 mantissa quantization is the consumer's
    explicit opt-in.  With a non-default ``out_dtype``, unrecognized chains
    fall back to ``chain.jforward`` wrapped with a final cast (refusing
    complex outputs loudly); the f32 default keeps ``jforward``'s native
    dtypes — an STFT chain still returns its complex spectrum.  Only
    ``float32`` and ``bfloat16`` are accepted (the two store layouts the
    Pallas kernel and the bit-identity suite validate).

    Matched (fused) chains also accept **int16 PCM** input, interpreted as
    ``x / 32768`` (the ``utils.misc.import_data`` convention) — the raw
    serving-ingest contract.  Bit-identical to pre-converting: int16->f32
    is lossless and the scale is a power of two.  Already-mono PCM rides
    the Pallas kernel's in-kernel convert, halving the input DMA
    (``fused_melspec`` docstring); chains with a ``Mono`` mix convert at
    entry (channel mixing needs float arithmetic).  Unmatched fallback
    chains keep the float-only contract.

    ``mesh=``: multi-chip serving — the returned forward is wrapped in
    ``shard_map`` over ``shard_axis`` (leading batch dim), so each device
    invokes the single-device dispatch (Pallas kernel included) on its
    local slice; the compiled module contains NO collectives for the
    batch operand (parallel/sharding.py:shard_map_batch, asserted by
    tests/test_parallel.py's HLO inspection).
    """
    if backend not in ("auto", "xla", "pallas"):
        raise ValueError("unknown fuse backend %r" % backend)
    if mesh is not None:
        # multi-chip: STRUCTURAL batch partitioning via shard_map — each
        # device runs the single-device dispatch (Pallas kernel included)
        # on its local slice; no collectives, no GSPMD custom-call
        # handling in the loop (parallel/sharding.py:shard_map_batch;
        # the no-all-gather contract is asserted by tests/test_parallel.py
        # and the driver dryrun).
        from .parallel.sharding import shard_map_batch

        inner = fuse_forward(chain, backend=backend, out_dtype=out_dtype)
        return shard_map_batch(inner, mesh, shard_axis)
    out_dtype = jnp.dtype(out_dtype)
    if out_dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(
            "fuse_forward: out_dtype must be float32 or bfloat16, got %s"
            % out_dtype
        )
    mfcc_match = _match_mfcc(chain)
    if mfcc_match is not None:
        mono, mfcc = mfcc_match
        be = backend
        if be == "auto":
            import jax

            # r3 sweep: the kernel wins at every measured MFCC shape
            # (1.24x at overlap 2 to 2.32x at 2048/512; r3.5: 2.41x at
            # 4096/512 at 1.4e-5 vs the chain — the 128-mel power-2 path
            # stays far inside the budget, no x4 needed)
            from .regions import mfcc_region_ok

            be = (
                "pallas"
                if jax.default_backend() == "tpu"
                and mfcc_region_ok(mfcc.n_fft, mfcc.hop_length)
                else "xla"
            )
        return _fused_mfcc(mono, mfcc, be, out_dtype=out_dtype)
    requested = backend
    if backend == "auto":
        backend = "pallas" if _pallas_preferred(chain) else "xla"
    match = _match_melspec(chain, backend)
    if match is None:
        # stacked spectral representations: [Mono?] + (STFT|DGT) +
        # (Polar | PolarIF | Cartesian) — one kernel computes both
        # channels from a single DFT (_match_repr docstring)
        rb = requested
        if rb == "auto":
            rb = "pallas" if _repr_pallas_preferred(chain) else "xla"
        rmatch = _match_repr(chain, rb)
        if rmatch is not None and out_dtype == jnp.float32:
            mono_r, stft_r, rep, second = rmatch
            if rb == "pallas":
                return _pallas_fused_repr(mono_r, stft_r, rep, second)
            return _xla_fused_repr(mono_r, stft_r, rep, second)
        if requested == "pallas":
            # an explicit kernel request must fail loudly — a silent
            # chain.jforward substitution would corrupt kernel validation
            # and timing runs (mirrors streaming.scan_roundtrip's loud
            # backend="fused" rejection)
            raise ValueError(
                "backend='pallas' requested but no Pallas-fused forward "
                "covers this chain (needs a [Mono?] + (STFT|DGT) + "
                "(Magnitude | Polar | PolarIF | Cartesian) or MFCC pattern "
                "inside the Mosaic constraints: hop | n_fft, non-log "
                "contrast, f32 output for representations); use "
                "backend='auto' to fall back"
            )
        if out_dtype == jnp.float32:
            return chain.jforward

        def _cast_fallback(x):
            import jax

            y = chain.jforward(x)
            for leaf in jax.tree_util.tree_leaves(y):
                if jnp.issubdtype(leaf.dtype, jnp.complexfloating):
                    # astype would silently drop the imaginary part — the
                    # exact silent-trap class this library forbids
                    raise ValueError(
                        "fuse_forward(out_dtype=%s): chain produces complex "
                        "output; cast a real representation instead"
                        % out_dtype
                    )
            return jax.tree_util.tree_map(
                lambda leaf: leaf.astype(out_dtype), y
            )

        return _cast_fallback
    mono, stft_t, mag_t = match
    if backend == "pallas":
        return _pallas_fused(mono, stft_t, mag_t, out_dtype=out_dtype)
    return _xla_fused(mono, stft_t, mag_t, out_dtype=out_dtype)


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
    # the stats epilogue runs the Pallas kernel; "log"/"log10" amplify its
    # ~5e-5 bf16x3 magnitude error unboundedly near silent bins, and the
    # min statistic is dominated by exactly those bins — mirror the forward
    # matcher's contrast gate (ADVICE r2) and fall back to the exact cascade
    if mag_t.contrast_mode in ("log", "log10"):
        return None
    # non-cosine windows run the full-K stats kernel; at n_fft=4096 the
    # forward full-K measured only ~1.07x over XLA at this FLOP wall
    # (BENCH_NOTES.md r3.6c) and the stats variant is unmeasured there —
    # fall back to the exact cascade past 2048
    from .regions import fit_fullk_max_n_fft

    if (
        getattr(stft_t, "_window_taps", None) is None
        and stft_t.n_fft > fit_fullk_max_n_fft()
    ):
        return None
    return mono, stft_t, mag_t


def _match_repr_fit(chain: AudioTransform):
    """Like :func:`_match_fit` for stacked spectral-representation chains.

    Reuses the Pallas forward matcher (framing constraints plus the
    log/log10 contrast gate — the same bf16x3-amplification argument as
    :func:`_match_fit` applies to the channel-1 statistics) and mirrors
    its full-K n_fft cap."""
    match = _match_repr(chain, backend="pallas")
    if match is None:
        return None
    stft_t = match[1]
    from .regions import fit_fullk_max_n_fft

    if (
        getattr(stft_t, "_window_taps", None) is None
        and stft_t.n_fft > fit_fullk_max_n_fft()
    ):
        return None
    return match


def _norm_from_stats(norm, st: dict, count):
    """Fitted copy of a :class:`Normalize` from kernel-reduced statistics
    (``st``: sum/sumsq/min/max scalars), matching ``Normalize.fit``."""
    if norm.mode == "unipolar":
        offset = st["min"]
        scale = st["max"] - st["min"]
    elif norm.mode == "bipolar":
        offset = (st["max"] + st["min"]) / 2.0
        scale = st["max"] - offset
    else:  # gaussian
        n = jnp.asarray(count, jnp.float32)
        offset = st["sum"] / n
        var = jnp.maximum(st["sumsq"] - n * offset * offset, 0.0)
        # single-pass sumsq - n*mean^2 cancels catastrophically when
        # std << mean and the clamp can hit exactly 0; floor the scale
        # so Normalize.forward never divides by zero (the two-pass
        # chain.fit path returns a small positive std here)
        scale = jnp.maximum(
            jnp.sqrt(var / jnp.maximum(n - 1.0, 1.0)), 1e-12
        )
    new_norm = norm.replace(offset=offset, scale=scale)
    new_norm.needs_scaling = False
    return new_norm


def fit_fusable(chain: AudioTransform) -> bool:
    return _match_fit(chain) is not None or _match_repr_fit(chain) is not None


def _combine_stats(st, axis_name: str):
    """Cross-shard combine of a kernel stats tree (inside ``shard_map``):
    sums/counts all-reduce with ``psum``, extrema with ``pmin``/``pmax``."""
    from jax import lax

    out = {}
    for k, v in st.items():
        if isinstance(v, dict):
            out[k] = _combine_stats(v, axis_name)
        elif k == "min":
            out[k] = lax.pmin(v, axis_name)
        elif k == "max":
            out[k] = lax.pmax(v, axis_name)
        elif k == "count" and isinstance(v, int):
            # shard-static element count (B_loc*T*F) — identical on every
            # shard, so the global count is an exact trace-time integer
            # product; psum'ing it through f32 would round above 2^24
            # elements (easily reached at fit scale)
            out[k] = v * lax.psum(1, axis_name)
        else:  # sum / sumsq
            out[k] = lax.psum(jnp.asarray(v, jnp.float32), axis_name)
    return out


def _sharded_stats(stats_fn, flat, mesh, axis_name: str):
    """Run a per-shard stats kernel under ``shard_map`` and combine.

    The batch axis is split structurally (each device invokes the Pallas
    stats kernel on its local rows); the only cross-device traffic is the
    O(1) scalar combine — the multi-chip fit contract (VERDICT r3 weak
    #2).  ``flat`` is the (B, L) mono audio; ``B`` must be divisible by
    the mesh axis size."""
    import jax
    # shard_map + the matching check kwarg spelling for this jax version
    from .parallel.sharding import _NO_CHECK, shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis_name]
    B = flat.shape[0]
    if B % n:
        raise ValueError(
            "fuse_fit(mesh=): batch %d not divisible by mesh axis %r "
            "size %d" % (B, axis_name, n)
        )
    out_sds = jax.eval_shape(
        stats_fn,
        jax.ShapeDtypeStruct((B // n,) + flat.shape[1:], flat.dtype),
    )
    out_specs = jax.tree_util.tree_map(lambda _: P(), out_sds)

    def local(f):
        return _combine_stats(stats_fn(f), axis_name)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None),),
        out_specs=out_specs,
        **_NO_CHECK,
    )(flat)


def fuse_fit(
    chain: AudioTransform,
    backend: str = "auto",
    mesh=None,
    shard_axis: str = "data",
) -> Callable[[jnp.ndarray], AudioTransform]:
    """Return a one-kernel-pass ``fit`` for a melspec chain.

    The returned callable maps raw audio to a fitted copy of ``chain``
    exactly like ``chain.fit(x)``, but the normalization statistics are
    reduced *inside* the fused Pallas kernel epilogue
    (ops/pallas/spectral.py:fused_melspec_stats): neither the framed signal
    (an ``n_fft/hop``-fold blow-up of the input) nor the spectrogram is ever
    materialized in HBM — only an (8, bins) stats block leaves the chip.
    The XLA fit path cannot express this (its reduction consumer still
    forces the framed GEMM operand out to HBM).

    Stacked spectral-representation chains (``[Mono?] + (STFT|DGT) +
    (Polar|PolarIF|Cartesian)``) fit BOTH channel normalizers from one
    kernel pass (ops/pallas/spectral.py:fused_repr_stats) — channel 1 on
    the non-mel contrasted magnitude (the reference ``scale_data`` quirk)
    or the real part, channel 2 on the wrapped phase / frame-local IF /
    imaginary part.  Caveat for channel 2: a SILENT bin's phase is
    ``atan2`` of denormal noise — ill-conditioned in *both* paths — so on
    signals whose spectrum has large silent regions the fitted phase/IF
    affines can differ from ``chain.fit`` at the O(1e-3 * scale) level
    (measured: tones-only 6e-4, any broadband content 4e-5); the
    magnitude channel is unconditionally within kernel accuracy.

    Like the fused forwards, matched chains accept **int16 PCM** input
    (``x / 32768``, the ``import_data`` convention): chains with a ``Mono``
    mix convert at entry, already-mono PCM rides the stats kernel's
    in-kernel convert — the fitted statistics equal fitting the
    pre-converted float audio.

    ``backend="auto"`` (default) takes the kernel-stats path only on TPU —
    off-TPU it would run the Pallas interpreter, orders of magnitude
    slower than the exact cascade, so auto returns ``chain.jfit`` there
    (the same gate every other auto dispatcher applies).
    ``backend="pallas"`` forces the kernel-stats path on any platform
    (interpret mode off-TPU — the validation tool the tests use).
    Chains that don't match the pattern fall back to ``chain.jfit``
    on either backend.

    ``mesh=``: multi-chip fit — each device runs the stats kernel on its
    local batch slice under ``shard_map`` and only the O(1) scalar
    statistics all-reduce (``_sharded_stats``); the audio batch is never
    gathered.  Unmatched fallback chains ignore ``mesh`` (``chain.jfit``
    under jit reduces correctly through GSPMD's own partitioning).
    """
    if backend not in ("auto", "pallas"):
        raise ValueError("unknown fuse_fit backend %r" % backend)
    if backend == "auto":
        import jax

        if jax.default_backend() != "tpu":
            return chain.jfit
    from .transforms.norm import Normalize

    def _fittable(norm):
        return isinstance(norm, Normalize) and norm.mode is not None

    match = _match_fit(chain)
    if match is not None:
        mono, stft_t, mag_t = match
        from .ops.pallas.spectral import fused_melspec_stats

        norm = mag_t.norm
        if not _fittable(norm):
            return chain.jfit  # nothing to fit on this pattern

        taps = getattr(stft_t, "_window_taps", None)

        def fit(x: jnp.ndarray, mask=None) -> AudioTransform:
            if mask is not None:
                # bucket-padding masks need the masked reductions of the
                # exact cascade (transforms/norm.py fit) — the kernel
                # epilogue only masks its own tile padding
                return chain.fit(x, mask=mask)
            # int16 PCM through a Mono mix needs the float convert the
            # fused forwards apply (already-mono PCM converts in-kernel)
            y = mono.forward(_from_pcm_for_mono(mono, x)) if mono is not None else x
            flat = y.reshape((-1, y.shape[-1]))

            def _stats(f):
                return fused_melspec_stats(
                    f,
                    stft_t.n_fft,
                    stft_t.hop_length,
                    stft_t.window,
                    mag_t.contrast_mode or "none",
                    taps=taps,
                )

            st = (
                _sharded_stats(_stats, flat, mesh, shard_axis)
                if mesh is not None
                else _stats(flat)
            )
            new_mag = mag_t.replace(
                norm=_norm_from_stats(norm, st, st["count"])
            )
            # Mono/STFT fits are no-ops in the matched pattern; only the
            # Magnitude's norm carries fitted state.
            children = [new_mag if t is mag_t else t for t in chain.transforms]
            return ComposeAudioTransform(transforms=children, sr=chain.sr)

        return fit

    rmatch = _match_repr_fit(chain)
    if rmatch is None:
        return chain.jfit
    mono, stft_t, rep, second = rmatch
    if not (_fittable(rep.magnitude.norm) or _fittable(rep.phase.norm)):
        return chain.jfit  # both channels Dummy-normed: nothing to fit
    from .ops.pallas.spectral import fused_repr_stats

    taps = getattr(stft_t, "_window_taps", None)
    contrast = (
        "none" if second == "imag"
        else (rep.magnitude.contrast_mode or "none")
    )
    weighted = bool(getattr(rep.phase, "weighted", False))

    def fit_repr(x: jnp.ndarray, mask=None) -> AudioTransform:
        if mask is not None:
            return chain.fit(x, mask=mask)
        y = mono.forward(_from_pcm_for_mono(mono, x)) if mono is not None else x
        flat = y.reshape((-1, y.shape[-1]))

        def _stats(f):
            return fused_repr_stats(
                f,
                stft_t.n_fft,
                stft_t.hop_length,
                stft_t.window,
                second,
                contrast=contrast,
                weighted=weighted,
                taps=taps,
            )

        st = (
            _sharded_stats(_stats, flat, mesh, shard_axis)
            if mesh is not None
            else _stats(flat)
        )
        new_mag, new_ph = rep.magnitude, rep.phase
        if _fittable(new_mag.norm):
            new_mag = new_mag.replace(
                norm=_norm_from_stats(new_mag.norm, st["ch1"], st["count"])
            )
        if _fittable(new_ph.norm):
            new_ph = new_ph.replace(
                norm=_norm_from_stats(new_ph.norm, st["ch2"], st["count"])
            )
        new_rep = rep.replace(magnitude=new_mag, phase=new_ph)
        children = [new_rep if t is rep else t for t in chain.transforms]
        return ComposeAudioTransform(transforms=children, sr=chain.sr)

    return fit_repr
