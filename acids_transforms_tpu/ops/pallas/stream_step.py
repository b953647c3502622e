"""Fused streaming roundtrip: the whole chunked session in ONE kernel.

The canonical realtime loop (reference stft.py:324-352) is
``OverlapAdd -> RealtimeSTFT.forward -> [processing] -> invert ->
OverlapAdd.invert`` per chunk.  Compiled as a generic chain scan, each step
is ~20 tiny XLA ops (ring-buffer concats, frame slices, two GEMM pairs, OLA
pads) whose fixed per-op sequencing overhead dominates at streaming sizes —
measured 34 us/step for the OverlapAdd state machine alone at the bench
shape (chunk 4096), with the actual math far under 10 us.  A
pallas_call-per-step variant was built and measured SLOWER (2.9 vs 2.0 ms):
each call re-fetches the ~20 MB DFT bases from HBM.

This kernel therefore runs the WHOLE session: the grid walks chunks
sequentially ('arbitrary'), the bases load into VMEM once, the input rows
stream through overlapping Element windows (the ring buffer becomes the
window overlap — no carried input state at all), and the OLA tail is the
only carry, in VMEM scratch persisting across grid steps.  Per chunk:
frame assembly -> windowed DFT (one stacked bf16x4 GEMM) -> complex
spectrum in VMEM -> windowed iDFT (one stacked GEMM; synthesis window and
OLA gain folded in) -> overlap-add with the carried tail.

``streaming.scan_roundtrip`` dispatches here automatically for recognized
``[OverlapAdd, RealtimeSTFT]`` chains doing a complex (direct) roundtrip —
the math is identical to the generic chain scan (exactness-tested; bf16x4
keeps the roundtrip at ~100 dB, above the TPU generic path's bf16x3);
phaseless modes and chains with processing in between keep the generic
scan.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fft import _dft_matrices, _idft_matrices
from .ola import ola_accumulate, ola_layout, ola_supported, ola_tile_unit
from .spectral import LANE, _round_up, _split_bf16

__all__ = ["fused_roundtrip_available", "make_fused_roundtrip"]

_WIN_PAD = 8  # Element-window sublane alignment over-fetch


def fused_roundtrip_available(chain, chunk_size: int) -> bool:
    """True when ``chain`` is ``[OverlapAdd, RealtimeSTFT-family]`` with
    matching (n_fft, hop), ``hop | chunk``, an OLA-supported hop (lane
    multiple, or ``hop % 8 == 0`` at lane-multiple n_fft — the lcm-packed
    layout, ops/pallas/ola.py) and overlap <= ``_WIN_PAD``."""
    from ...transforms.base import ComposeAudioTransform
    from ...transforms.oadd import OverlapAdd
    from ...transforms.stft import RealtimeSTFT

    if not isinstance(chain, ComposeAudioTransform) or len(chain) != 2:
        return False
    oadd, rt = chain.transforms
    if not isinstance(oadd, OverlapAdd) or not isinstance(rt, RealtimeSTFT):
        return False
    return (
        oadd.n_fft == rt.n_fft
        and oadd.hop_length == rt.hop_length
        and rt.n_fft % rt.hop_length == 0
        and 2 <= rt.n_fft // rt.hop_length <= _WIN_PAD
        and ola_supported(rt.n_fft, rt.hop_length)
        and chunk_size % rt.hop_length == 0
        and chunk_size >= rt.n_fft
    )


def _session_kernel(
    rows_ref, ana_basis_ref, syn_basis_ref,
    o_ref, tail_ref, *, T_c, overlap, hop,
):
    f32 = jnp.float32
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        tail_ref[...] = jnp.zeros_like(tail_ref)

    rows = rows_ref[...]                          # (B, T_c + _WIN_PAD, hop)
    B = rows.shape[0]
    n_rows = rows.shape[1]
    # frame i = rows i..i+overlap-1 (roll-then-slice: Mosaic cannot concat
    # operands with different sublane offsets)
    parts = [
        pltpu.roll(rows, shift=(n_rows - j) % n_rows, axis=1)[:, :T_c, :]
        for j in range(overlap)
    ]
    frames = jnp.concatenate(parts, axis=2)       # (B, T_c, n_fft)
    flat = frames.reshape(B * T_c, overlap * hop)
    # bf16x4 (not the usual x3): these GEMMs are latency-dominated at
    # streaming sizes, so the 4th (lo x lo) term is ~free and keeps the
    # direct roundtrip above the generic TPU path's accuracy
    fh, fl = _split_bf16(flat)
    stacked = jnp.concatenate([fh, fh, fl, fl], axis=1)
    Z = jnp.dot(stacked, ana_basis_ref[...], preferred_element_type=f32)
    # Z = [re | im] (B*T_c, 2 Fp): the complex spectrum, in VMEM — exactly
    # what the chain's forward produces (analysis window folded in)
    zh, zl = _split_bf16(Z)
    zstk = jnp.concatenate([zh, zh, zl, zl], axis=1)
    td = jnp.dot(zstk, syn_basis_ref[...], preferred_element_type=f32)
    # synthesis frames -> overlap-add: aligned hops carve (overlap, hop)
    # lane blocks; hop % 8 == 0 uses the lcm-packed chunk layout
    # (ops/pallas/ola.py) — emitted rows are then 128-sample chunks
    acc, S = ola_accumulate(td, B, T_c, overlap * hop, hop)
    acc = acc + jnp.concatenate(
        [tail_ref[...], jnp.zeros((B, S, acc.shape[-1]), f32)], axis=1
    )
    o_ref[...] = acc[:, :S, :]
    tail_ref[...] = acc[:, S:, :]


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "T_c", "n_chunks", "interpret"),
)
def _session_call(rows, ana_basis, syn_basis, n_fft, hop, T_c, n_chunks, interpret):
    B = rows.shape[0]
    overlap = n_fft // hop
    kernel = functools.partial(
        _session_kernel, T_c=T_c, overlap=overlap, hop=hop,
    )
    rows_out, out_w, carry_rows = ola_layout(n_fft, hop, T_c)

    def fixed(m):
        return pl.BlockSpec(m.shape, lambda t: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(B), pl.Element(T_c + _WIN_PAD), pl.Element(hop)),
                lambda t: (0, t * T_c, 0),
                memory_space=pltpu.VMEM,
            ),
            fixed(ana_basis),
            fixed(syn_basis),
        ],
        out_specs=pl.BlockSpec(
            (B, rows_out, out_w), lambda t: (0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_chunks * rows_out, out_w), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((B, carry_rows, out_w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the two bf16x4 bases alone are ~21 MB at n_fft=1024
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rows, ana_basis, syn_basis)


def make_fused_roundtrip(chain, chunk_size: int, interpret: Optional[bool] = None):
    """Build the whole-session fused roundtrip ``fn(x) -> rec`` for a
    recognized ``[OverlapAdd, RealtimeSTFT]`` chain (see module docs).

    ``x (..., L)`` is chunk-padded exactly like ``streaming.chunk_signal``;
    the result matches the generic ``scan_roundtrip`` chunk for chunk.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    oadd, rt = chain.transforms
    n_fft, hop = rt.n_fft, rt.hop_length
    overlap = n_fft // hop
    T_c = chunk_size // hop
    F = n_fft // 2 + 1
    Fp = _round_up(F, LANE)
    carry_rows = overlap - 1

    import numpy as np

    C_np, S_np = _dft_matrices(n_fft)
    w = jnp.asarray(rt.window, jnp.float32)[:, None]
    WC = w * jnp.asarray(np.pad(C_np, [(0, 0), (0, Fp - F)]))
    WS = w * jnp.asarray(np.pad(S_np, [(0, 0), (0, Fp - F)]))
    wc_hi, wc_lo = _split_bf16(WC)
    ws_hi, ws_lo = _split_bf16(WS)
    top = jnp.concatenate([wc_hi, ws_hi], axis=1)
    mid = jnp.concatenate([wc_lo, ws_lo], axis=1)
    ana_basis = jnp.concatenate([top, mid, top, mid], axis=0)  # (4 n_fft, 2 Fp)

    A, Bm = _idft_matrices(n_fft)
    inv_w = jnp.asarray(rt.inv_window, jnp.float32)[None, :]
    gain = jnp.asarray(oadd.gain_compensation, jnp.float32)
    AB = jnp.concatenate(
        [
            jnp.pad(jnp.asarray(A), [(0, Fp - F), (0, 0)]) * inv_w / gain,
            jnp.pad(jnp.asarray(Bm), [(0, Fp - F), (0, 0)]) * inv_w / gain,
        ],
        axis=0,
    )
    ab_hi, ab_lo = _split_bf16(AB)
    syn_basis = jnp.concatenate(
        [ab_hi, ab_lo, ab_hi, ab_lo], axis=0
    )  # (8 Fp, n_fft)

    def run(x: jnp.ndarray) -> jnp.ndarray:
        batch_shape = x.shape[:-1]
        L = x.shape[-1]
        n_chunks = -(-L // chunk_size)
        n_frames = n_chunks * T_c
        xb = x.reshape((-1, L))
        B = xb.shape[0]
        # chunk granularity is internal to the session kernel (frames are
        # global, the OLA tail carries) — larger grid steps amortize the
        # per-step fixed cost without changing any output sample.  The
        # per-step intermediates scale with B * T_k (the synthesis-frame
        # block alone is B*T_k*n_fft f32), so cap that product: B=32 at
        # T_k=128 measured a scoped-VMEM OOM (82 MB vs the 64 MB limit)
        # where B*T_k <= 1024 compiles with headroom at every B <= 64.
        # packed small hops need q | T_k (q frames per emitted chunk row);
        # q is a power of two, so the sublane/packing lcm is just the max
        unit = ola_tile_unit(hop)
        T_k = min(
            _round_up(n_frames, unit),
            128,
            max(unit, _round_up(1024 // B, unit)),
        )
        n_steps = -(-n_frames // T_k)
        total_rows = carry_rows + n_steps * T_k + (_WIN_PAD - carry_rows)
        sig = jnp.concatenate(
            [
                jnp.zeros((B, carry_rows * hop), x.dtype),  # initial ring
                xb,
                jnp.zeros((B, total_rows * hop - carry_rows * hop - L), x.dtype),
            ],
            axis=-1,
        )
        rows = sig.reshape(B, total_rows, hop)
        out = _session_call(
            rows, ana_basis, syn_basis, n_fft, hop, T_k, n_steps, interpret
        )
        out = out.reshape(batch_shape + (n_steps * T_k * hop,))
        return out[..., : n_chunks * chunk_size]

    return run
