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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fft import _dft_matrices, _idft_matrices
from .ola import ola_accumulate, ola_layout, ola_supported, ola_tile_unit
from .spectral import LANE, _round_up, _split_bf16

__all__ = [
    "fused_roundtrip_available", "make_fused_roundtrip",
    "fused_random_roundtrip_available", "make_fused_random_roundtrip",
    "fused_pghi_roundtrip_available", "make_fused_pghi_roundtrip",
    "fused_pghi_gl_roundtrip_available", "make_fused_pghi_gl_roundtrip",
    "fused_random_invert_available", "make_fused_random_invert",
    "fused_pghi_invert_available", "make_fused_pghi_invert",
    "fused_pghi_gl_invert_available", "make_fused_pghi_gl_invert",
    "fused_forward_session_available", "make_fused_forward_session",
    "fused_complex_invert_available", "make_fused_complex_invert",
]

_WIN_PAD = 8  # Element-window sublane alignment over-fetch


# --------------------------------------------------- shared wrapper pieces
# The three session makers (complex / pghi / pghi_gl) share the basis
# construction, the row layout, the silent-bin angle pipeline, and the
# batch-slab loop — one definition each, so a fix cannot silently diverge.

def _ana_basis(window, n_fft: int, F: int, Fp: int):
    """Stacked bf16x4 windowed-DFT analysis basis ``(4 n_fft, 2 Fp)``."""
    C_np, S_np = _dft_matrices(n_fft)
    w = jnp.asarray(window, jnp.float32)[:, None]
    WC = w * jnp.asarray(np.pad(C_np, [(0, 0), (0, Fp - F)]))
    WS = w * jnp.asarray(np.pad(S_np, [(0, 0), (0, Fp - F)]))
    wc_hi, wc_lo = _split_bf16(WC)
    ws_hi, ws_lo = _split_bf16(WS)
    top = jnp.concatenate([wc_hi, ws_hi], axis=1)
    mid = jnp.concatenate([wc_lo, ws_lo], axis=1)
    return jnp.concatenate([top, mid, top, mid], axis=0)


def _syn_basis(inv_window, n_fft: int, F: int, Fp: int, scale):
    """Stacked bf16x4 windowed-iDFT synthesis basis ``(8 Fp, n_fft)`` with
    the synthesis window and a gain ``scale`` folded in."""
    A, Bm = _idft_matrices(n_fft)
    inv_w = jnp.asarray(inv_window, jnp.float32)[None, :]
    AB = jnp.concatenate(
        [
            jnp.pad(jnp.asarray(A), [(0, Fp - F), (0, 0)]) * inv_w / scale,
            jnp.pad(jnp.asarray(Bm), [(0, Fp - F), (0, 0)]) * inv_w / scale,
        ],
        axis=0,
    )
    hi, lo = _split_bf16(AB)
    return jnp.concatenate([hi, lo, hi, lo], axis=0)


def _session_rows(xb, carry_rows: int, total_rows: int, hop: int):
    """Lay the flat-batch signal out as overlapping hop-rows: ``carry_rows``
    zero rows of initial ring state, the signal, zero tail pad."""
    B, L = xb.shape
    sig = jnp.concatenate(
        [
            jnp.zeros((B, carry_rows * hop), xb.dtype),
            xb,
            jnp.zeros((B, total_rows * hop - carry_rows * hop - L), xb.dtype),
        ],
        axis=-1,
    )
    return sig.reshape(B, total_rows, hop)


def _session_angles(
    key, n_chunks: int, T_c: int, F: int, Fp: int, batch_shape,
    pre_splits: int = 0,
):
    """Silent-bin random phases for the whole session, replicating the
    generic scan's exact key pipeline (one key per chunk, then the Compose
    ``step_invert`` child split — the RealtimeSTFT, iterated right-to-left,
    draws ``split(k)[1]`` after ``pre_splits`` children to its right each
    consumed a ``split(k)[0]`` step: 0 for 2-chains, 1 when a Magnitude
    follows) so the draws are bit-equal.  Returns ``(B, n_chunks * T_c,
    Fp)`` f32 — note this materializes the WHOLE session's angles in HBM
    (~``4 * Fp / hop`` bytes per input sample); the auto dispatch gates on
    this footprint (streaming.scan_roundtrip)."""
    sess_key = jax.random.PRNGKey(0) if key is None else key
    chunk_keys = jax.random.split(sess_key, n_chunks)

    def child_key(k):
        for _ in range(pre_splits):
            k = jax.random.split(k)[0]
        return jax.random.split(k)[1]

    child_keys = jax.vmap(child_key)(chunk_keys)
    angles = jax.vmap(
        lambda k: 2.0 * jnp.pi * jax.random.uniform(
            k, batch_shape + (T_c, F), dtype=jnp.float32
        )
    )(child_keys)  # (n_chunks, ..., T_c, F)
    angles = jnp.moveaxis(angles, 0, -3) if angles.ndim > 3 else angles
    angles = angles.reshape((-1, n_chunks * T_c, F))
    return jnp.pad(angles, [(0, 0), (0, 0), (0, Fp - F)])


def _run_batch_slabs(call, B: int, slab: int, *arrays):
    """Run ``call`` over batch slabs of at most ``slab`` streams and
    concatenate.  Streams are independent (all carried state is per-stream),
    so the split is exact; it bounds the kernels' scoped-VMEM footprint,
    which grows linearly in B (every block rides the batch whole)."""
    if B <= slab:
        return call(*arrays)
    return jnp.concatenate(
        [call(*(a[i: i + slab] for a in arrays)) for i in range(0, B, slab)],
        axis=0,
    )


def _pghi_session_slab(n_fft, hop, T_c, Fp, ctx=0, la=0, mag_in=False):
    """Largest batch slab whose phaseless session call fits scoped VMEM.

    Same fitted model as ``pghi_kernel._slab_b``: sum the double-buffered
    blocks and scratch rows per stream, budget 56 MB of modeled bytes
    against the 100/110 MB limit (the compiler's scoped accounting runs
    ~1.2-1.6x the raw sum).  Capped at 64 — the sweep-validated region
    (BENCH_NOTES.md r3.20/21); larger batches split exactly.
    ``mag_in=True`` models the invert-only (decode) sessions: the input
    block is the chunk's magnitudes ``(T_c, Fp)`` instead of signal rows."""
    overlap = n_fft // hop
    rows_out, out_w, carry_rows = ola_layout(n_fft, hop, T_c)
    Tp = _round_up(T_c + la, 8)         # fill rows (lookahead included)
    in_block = T_c * Fp if mag_in else (T_c + _WIN_PAD) * hop
    per_b = 4 * (
        2 * in_block                    # input block, double-buffered
        + 2 * Tp * Fp                   # angles block (8-aligned)
        + 2 * rows_out * out_w          # output block
        + 3 * Fp                        # mag carry (2 rows) + phase carry
        + carry_rows * out_w            # OLA tail
        + Tp * 2 * Fp                   # phi | re | im scratch
        + 5 * Tp * Fp                   # recurrence fields
        + la * Fp                       # pending-magnitude carry
    )
    if ctx:
        Tx = _round_up(ctx + T_c + la, 8)
        per_b += 4 * (
            2 * ctx * Fp                              # gl_mag / gl_phase
            + _round_up(Tx + overlap - 1, 8) * hop    # projection OLA scratch
        )
    return max(8, min(64, (56 * 1024 * 1024 // per_b) // 8 * 8))


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
    T_c = chunk_size // hop
    F = n_fft // 2 + 1
    Fp = _round_up(F, LANE)
    carry_rows = n_fft // hop - 1

    ana_basis = _ana_basis(rt.window, n_fft, F, Fp)
    syn_basis = _syn_basis(
        rt.inv_window, n_fft, F, Fp,
        jnp.asarray(oadd.gain_compensation, jnp.float32),
    )

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
        # T_k bottoms out at `unit`, so beyond B = 1024 // unit the product
        # would grow unbounded — split the batch exactly instead
        slab = max(8, (1024 // unit) // 8 * 8)
        Bs = min(B, slab)
        T_k = min(
            _round_up(n_frames, unit),
            128,
            max(unit, _round_up(1024 // Bs, unit)),
        )
        n_steps = -(-n_frames // T_k)
        total_rows = carry_rows + n_steps * T_k + (_WIN_PAD - carry_rows)
        rows = _session_rows(xb, carry_rows, total_rows, hop)
        out = _run_batch_slabs(
            lambda r: _session_call(
                r, ana_basis, syn_basis, n_fft, hop, T_k, n_steps, interpret
            ),
            B, slab, rows,
        )
        out = out.reshape(batch_shape + (n_steps * T_k * hop,))
        return out[..., : n_chunks * chunk_size]

    return run


# ===================================================== phaseless (random)

def fused_random_roundtrip_available(chain, chunk_size: int) -> bool:
    """True when an ``inversion_mode="random"`` session rides the fused
    kernel — the reference's DEFAULT realtime mode (reference
    stft.py:241-243).  Same layout constraints as the complex kernel:
    random mode has no per-chunk statistic, so grid steps may span chunk
    boundaries (the per-chunk uniform draws are just a frame-major angle
    layout in HBM)."""
    return fused_roundtrip_available(chain, chunk_size)


def _session_random_kernel(
    rows_ref, ana_basis_ref, syn_basis_ref, angles_ref,
    o_ref, tail_ref, reim_ref, *, T_k, overlap, hop, Fp, n_bins,
):
    """One grid step of the random-phase session: analysis DFT ->
    magnitudes -> the precomputed uniform phases -> synthesis + OLA.
    The only carried state is the OLA tail (exactly
    :func:`_session_kernel`); no recurrence, so grid steps are free to
    span chunk boundaries like the complex kernel's."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        tail_ref[...] = jnp.zeros_like(tail_ref)

    mag = _analyze_mag(rows_ref, ana_basis_ref, T_k, overlap, hop, Fp, x3=True)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 2)
    mm = jnp.where(lane3 < n_bins, mag, 0.0)
    _synth_and_emit(
        mm, angles_ref[...], reim_ref, syn_basis_ref, o_ref, tail_ref,
        T_c=T_k, overlap=overlap, hop=hop, Fp=Fp, x3=True,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop", "T_k", "n_steps", "Fp", "n_bins", "interpret",
    ),
)
def _session_random_call(
    rows, ana_basis, syn_basis, angles,
    n_fft, hop, T_k, n_steps, Fp, n_bins, interpret,
):
    B = rows.shape[0]
    overlap = n_fft // hop
    kernel = functools.partial(
        _session_random_kernel,
        T_k=T_k, overlap=overlap, hop=hop, Fp=Fp, n_bins=n_bins,
    )
    rows_out, out_w, carry_rows = ola_layout(n_fft, hop, T_k)

    def fixed(m):
        return pl.BlockSpec(m.shape, lambda t: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(B), pl.Element(T_k + _WIN_PAD), pl.Element(hop)),
                lambda t: (0, t * T_k, 0),
                memory_space=pltpu.VMEM,
            ),
            fixed(ana_basis),
            fixed(syn_basis),
            pl.BlockSpec(
                (B, T_k, Fp), lambda t: (0, t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, rows_out, out_w), lambda t: (0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_steps * rows_out, out_w), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((B, carry_rows, out_w), jnp.float32),  # OLA tail
            pltpu.VMEM((B, T_k, 2 * Fp), jnp.float32),        # re | im
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rows, ana_basis, syn_basis, angles)


def make_fused_random_roundtrip(
    chain, chunk_size: int, key=None, interpret: Optional[bool] = None
):
    """Whole-session fused random-phase roundtrip ``fn(x) -> rec`` for a
    recognized ``[OverlapAdd, RealtimeSTFT-family]`` chain with
    ``inversion_mode="random"`` (the reference's default realtime mode).

    Output matches ``scan_roundtrip(chain, x, chunk, inversion_mode=
    "random", key=key)``: the uniform phase draws replicate the generic
    scan's exact key pipeline (:func:`_session_angles`), so interpret mode
    is sample-level equal; on-chip the kernel runs the SAME bf16x3 GEMM
    precision as the generic path (random phases leave no accuracy story
    for the session kernels' usual x4 — and the mode is GEMM-bound at
    large batch, where x3's 25% MAC cut is throughput).  The whole
    session's angles materialize in HBM (the auto dispatch gates on this
    footprint, streaming.scan_roundtrip)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    oadd, rt = chain.transforms
    n_fft, hop = rt.n_fft, rt.hop_length
    T_c = chunk_size // hop
    F = n_fft // 2 + 1
    Fp = _round_up(F, LANE)
    carry_rows = n_fft // hop - 1

    ana_basis = _ana_basis(rt.window, n_fft, F, Fp)
    syn_basis = _syn_basis(
        rt.inv_window, n_fft, F, Fp,
        jnp.asarray(oadd.gain_compensation, jnp.float32),
    )

    def run(x: jnp.ndarray) -> jnp.ndarray:
        batch_shape = x.shape[:-1]
        L = x.shape[-1]
        n_chunks = -(-L // chunk_size)
        n_frames = n_chunks * T_c
        xb = x.reshape((-1, L))
        B = xb.shape[0]
        angles = _session_angles(key, n_chunks, T_c, F, Fp, batch_shape)
        unit = ola_tile_unit(hop)
        # the double-buffered angles block + the re|im scratch roughly
        # triple the complex kernel's per-(stream, frame) VMEM bytes at
        # the headline shape — halve its B*T_k product cap (512 vs 1024)
        slab = max(8, (512 // unit) // 8 * 8)
        Bs = min(B, slab)
        T_k = min(
            _round_up(n_frames, unit),
            128,
            max(unit, _round_up(512 // Bs, unit)),
        )
        n_steps = -(-n_frames // T_k)
        total_rows = carry_rows + n_steps * T_k + (_WIN_PAD - carry_rows)
        rows = _session_rows(xb, carry_rows, total_rows, hop)
        # per-chunk draws laid out frame-major; pad to the grid's
        # n_steps * T_k frames (padded frames have zero magnitude)
        angles = jnp.pad(
            angles, [(0, 0), (0, n_steps * T_k - n_frames), (0, 0)]
        )
        out = _run_batch_slabs(
            lambda r, a: _session_random_call(
                r, ana_basis, syn_basis, a,
                n_fft, hop, T_k, n_steps, Fp, F, interpret,
            ),
            B, slab, rows, angles,
        )
        out = out.reshape(batch_shape + (n_steps * T_k * hop,))
        return out[..., : n_chunks * chunk_size]

    return run


# ===================================================== phaseless (RT-PGHI)
def fused_pghi_roundtrip_available(chain, chunk_size: int) -> bool:
    """True when the PHASELESS (``inversion_mode="pghi"``) session rides the
    fused kernel: the :func:`fused_roundtrip_available` layout constraints,
    plus integer overlap (PGHI's carrier math) and a chunk frame count
    divisible by the OLA tile unit (the grid step is exactly one chunk —
    the streaming threshold ``tol * max(chunk)`` is a per-chunk statistic,
    so frames cannot regroup across chunk boundaries)."""
    from ...transforms.base import ComposeAudioTransform
    from ...transforms.oadd import OverlapAdd
    from ...transforms.stft import RealtimeSTFT

    if not isinstance(chain, ComposeAudioTransform) or len(chain) != 2:
        return False
    oadd, rt = chain.transforms
    if not isinstance(oadd, OverlapAdd) or not isinstance(rt, RealtimeSTFT):
        return False
    T_c = chunk_size // max(rt.hop_length, 1)
    return (
        fused_roundtrip_available(chain, chunk_size)
        and rt.n_fft % rt.hop_length == 0
        and T_c % ola_tile_unit(rt.hop_length) == 0
        and getattr(rt, "gamma", None) is not None
    )


def _session_pghi_kernel(
    rows_ref, ana_basis_ref, syn_basis_ref, angles_ref,
    o_ref, mprev_ref, phi_ref, tail_ref, reim_ref,
    ct_ref, sup_ref, sdn_ref, anc_ref, sig_ref,
    *, T_c, overlap, hop, n_fft, Fp, n_bins, fmul, tol,
):
    """One grid step = one chunk of the phaseless realtime session.

    Analysis (stacked bf16x4 windowed DFT) -> per-chunk threshold ->
    backward-stencil phase gradients (the RT-PGHI stencil, reference
    dgt.py:378-397 via ops/pghi.py:phase_gradients) -> the serial anchored
    fill (the offline PGHI kernel's frame_step, ops/pallas/pghi_kernel.py)
    -> windowed iDFT synthesis -> overlap-add.  VMEM scratch carries the
    previous chunk's last TWO magnitude rows (the RT-PGHI ``mag_buffer``),
    the last phase row (``phase_buffer``), and the OLA tail — the whole
    streaming state, resident across sequential grid steps.  Semantics
    equal the generic chain scan (``pghi_scan(time_stencil="backward",
    prev_mag, prev_phase)`` per chunk) up to a per-bin 2*pi phase
    convention (the generic carry re-wraps through ``angle``), which the
    synthesis trig cannot see.

    Parity contract: in interpret mode the output matches the generic
    scan sample-level (< 1e-3 rel — both DFT formulations evaluate in
    f32).  On the compiled chip the kernel's bf16x4 DFT and the generic
    path's bf16x3 GEMM disagree by ~1e-5 in magnitude, which can FLIP
    anchor/threshold decisions at exact boundaries — phases then differ
    at those bins while reconstruction QUALITY is identical (measured
    spectral convergence equal to 3 decimals at every swept shape,
    BENCH_NOTES.md r3.20).  The same class of contract as the fused GL
    kernels' quality-parity gates.
    """
    t = pl.program_id(0)
    B = rows_ref.shape[0]

    @pl.when(t == 0)
    def _init():
        mprev_ref[...] = jnp.zeros_like(mprev_ref)
        phi_ref[...] = jnp.zeros_like(phi_ref)
        tail_ref[...] = jnp.zeros_like(tail_ref)

    mag = _analyze_mag(rows_ref, ana_basis_ref, T_c, overlap, hop, Fp)
    phis = _rt_pghi_phases(
        mag, angles_ref, mprev_ref, phi_ref, reim_ref,
        ct_ref, sup_ref, sdn_ref, anc_ref, sig_ref,
        T_c=T_c, hop=hop, n_fft=n_fft, Fp=Fp, n_bins=n_bins,
        fmul=fmul, tol=tol,
    )
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (B, T_c, Fp), 2)
    mm = jnp.where(lane3 < n_bins, mag, 0.0)
    _synth_and_emit(
        mm, phis, reim_ref, syn_basis_ref, o_ref, tail_ref,
        T_c=T_c, overlap=overlap, hop=hop, Fp=Fp,
    )


def _analyze_mag(rows_ref, ana_basis_ref, T_c, overlap, hop, Fp, x3=False):
    """Chunk analysis: frames -> stacked bf16x4 windowed DFT -> magnitudes
    (pad lanes: the ana basis columns are zero there -> mag == 0).
    ``x3=True`` drops the 4th (lo x lo) product via a prefix ref-slice of
    the same basis — the generic TPU path's own precision
    (``Precision.HIGH``), for kernels with no accuracy story to protect
    (random phases) where the GEMMs bound large-batch throughput."""
    f32 = jnp.float32
    rows = rows_ref[...]
    B = rows.shape[0]
    n_rows = rows.shape[1]
    parts = [
        pltpu.roll(rows, shift=(n_rows - j) % n_rows, axis=1)[:, :T_c, :]
        for j in range(overlap)
    ]
    frames = jnp.concatenate(parts, axis=2)
    flat = frames.reshape(B * T_c, overlap * hop)
    fh, fl = _split_bf16(flat)
    if x3:
        stacked = jnp.concatenate([fh, fh, fl], axis=1)
        basis = ana_basis_ref[: 3 * (overlap * hop), :]
    else:
        stacked = jnp.concatenate([fh, fh, fl, fl], axis=1)
        basis = ana_basis_ref[...]
    Z = jnp.dot(stacked, basis, preferred_element_type=f32)
    Z3 = Z.reshape(B, T_c, 2 * Fp)
    re, im = Z3[:, :, :Fp], Z3[:, :, Fp:]
    return jnp.sqrt(re * re + im * im)


def _synth_and_emit(
    mm, phis, reim_ref, syn_basis_ref, o_ref, tail_ref,
    *, T_c, overlap, hop, Fp, x3=False,
):
    """Windowed iDFT synthesis + overlap-add with the carried tail
    (see :func:`_session_kernel`; ``x3`` as in :func:`_analyze_mag`).
    ``reim_ref`` may be taller than ``T_c`` rows (lookahead sessions size
    it for the fill grid); the synthesis then stores/reads an aligned
    ``T_c``-row prefix (T_c is a tile-unit multiple, so 8-aligned)."""
    f32 = jnp.float32
    B = mm.shape[0]
    vals = jnp.concatenate(
        [mm * jnp.cos(phis), mm * jnp.sin(phis)], axis=2
    )
    if reim_ref.shape[1] == T_c:
        reim_ref[...] = vals
        flat_s = reim_ref[...].reshape(B * T_c, 2 * Fp)
    else:
        reim_ref[:, pl.ds(0, T_c), :] = vals
        flat_s = reim_ref[...][:, :T_c, :].reshape(B * T_c, 2 * Fp)
    zh, zl = _split_bf16(flat_s)
    if x3:
        zstk = jnp.concatenate([zh, zh, zl], axis=1)
        basis = syn_basis_ref[: 6 * Fp, :]
    else:
        zstk = jnp.concatenate([zh, zh, zl, zl], axis=1)
        basis = syn_basis_ref[...]
    td = jnp.dot(zstk, basis, preferred_element_type=f32)
    acc, S = ola_accumulate(td, B, T_c, overlap * hop, hop)
    acc = acc + jnp.concatenate(
        [tail_ref[...], jnp.zeros((B, S, acc.shape[-1]), f32)], axis=1
    )
    o_ref[...] = acc[:, :S, :]
    tail_ref[...] = acc[:, S:, :]


def _rt_pghi_phases(
    mag, angles_ref, mprev_ref, phi_ref, reim_ref,
    ct_ref, sup_ref, sdn_ref, anc_ref, sig_ref,
    *, T_c, hop, n_fft, Fp, n_bins, fmul, tol,
    n_valid=None, commit=None,
):
    """The RT-PGHI chunk fill (see :func:`_session_pghi_kernel` docs):
    per-chunk threshold, backward-stencil gradients, anchors, and the
    serial anchored fill.  Returns the chunk's phases ``(B, T_c, Fp)`` and
    updates the carried state (``mprev_ref`` magnitude rows; ``phi_ref``
    ends at the last frame's phase).

    ``T_c`` is the row count of ``mag`` (8-aligned array rows); lookahead
    sessions pass ``n_valid`` < T_c real frames (trailing rows are zero
    alignment pad, skipped by the serial loop) and ``commit`` — the row
    count actually committed this step, whose last two magnitudes become
    the carried ``mag_buffer`` (the generic ``_update_buffers`` carries
    from the COMMITTED spec, transforms/stft.py:_update_buffers)."""
    from .pghi_kernel import _seg_scan

    if n_valid is None:
        n_valid = T_c
    if commit is None:
        commit = n_valid

    f32 = jnp.float32
    pi = jnp.float32(np.pi)
    B = mag.shape[0]
    eps = jnp.float32(1.19e-7)

    lane3 = jax.lax.broadcasted_iota(jnp.int32, (B, T_c, Fp), 2)
    in_bins = lane3 < n_bins

    # ---- per-CHUNK threshold (streaming semantics: each chunk's own max).
    # Two single-axis reduces ending in a full-lane (B, Fp) row — the
    # (B, 1, 1) two-axis keepdims reduce trips a Mosaic layout CHECK at
    # B > 1 (layout.h:320); the (B, Fp) broadcast row is the proven
    # pattern (ops/pallas/pghi_kernel.py abstol rows)
    mx_l = jnp.max(mag, axis=1)                       # (B, Fp)
    mx_row = jnp.max(mx_l, axis=-1, keepdims=True)    # (B, 1)
    abs_row = jnp.maximum(
        jnp.float32(tol) * jnp.broadcast_to(mx_row, (B, Fp)), eps
    )

    # ---- gradients, backward time stencil over [prev2; prev1; chunk]
    def lane_central(Yv):
        lv = jax.lax.broadcasted_iota(jnp.int32, Yv.shape, Yv.ndim - 1)
        up = jnp.where(
            lv == n_bins - 1, Yv, pltpu.roll(Yv, shift=Fp - 1, axis=Yv.ndim - 1)
        )
        dn = jnp.where(lv == 0, Yv, pltpu.roll(Yv, shift=1, axis=Yv.ndim - 1))
        return (up - dn) / 2.0

    Y = jnp.log(jnp.maximum(mag, eps))
    Yp = jnp.log(jnp.maximum(mprev_ref[...], eps))  # (B, 2, Fp) prev rows
    row3 = jax.lax.broadcasted_iota(jnp.int32, (B, T_c, Fp), 1)
    Yp0 = jnp.broadcast_to(Yp[:, 0:1, :], (B, T_c, Fp))
    Yp1 = jnp.broadcast_to(Yp[:, 1:2, :], (B, T_c, Fp))
    Ym1 = jnp.where(row3 == 0, Yp1, pltpu.roll(Y, shift=1, axis=1))
    Ym2 = pltpu.roll(Y, shift=2, axis=1)
    Ym2 = jnp.where(row3 == 0, Yp0, jnp.where(row3 == 1, Yp1, Ym2))
    dY_dt = (3.0 * Y - 4.0 * Ym1 + Ym2) / 2.0
    fs = -jnp.float32(fmul) * dY_dt + pi

    carrier = (2.0 * np.pi * hop / n_fft) * lane3.astype(f32)
    ts = lane_central(Y) / jnp.float32(fmul) + carrier
    ts_prev_row = lane_central(Yp[:, 1:2, :]) / jnp.float32(fmul) + (
        (2.0 * np.pi * hop / n_fft)
        * jax.lax.broadcasted_iota(jnp.int32, (B, 1, Fp), 2).astype(f32)
    )
    ts_prev = jnp.where(
        row3 == 0,
        jnp.broadcast_to(ts_prev_row, (B, T_c, Fp)),
        pltpu.roll(ts, shift=1, axis=1),
    )
    ct_ref[...] = (ts_prev + ts) / 2.0

    # frequency-fill trapezoid steps, both directions (see pghi_kernel)
    lane_eq0 = lane3 == 0
    lane_eqN = lane3 == n_bins - 1
    sup_ref[...] = jnp.where(
        lane_eq0, 0.0, (fs + pltpu.roll(fs, shift=1, axis=2)) / 2.0
    )
    sdn_ref[...] = jnp.where(
        lane_eqN, 0.0, -(fs + pltpu.roll(fs, shift=Fp - 1, axis=2)) / 2.0
    )

    # ---- anchors (RT semantics: previous frame = carried row at t=0)
    mp1 = jnp.broadcast_to(mprev_ref[:, 1:2, :], (B, T_c, Fp))
    prev_m = jnp.where(row3 == 0, mp1, pltpu.roll(mag, shift=1, axis=1))
    absb = jnp.broadcast_to(abs_row[:, None, :], (B, T_c, Fp))
    sig = (mag > absb) & in_bins
    prev_sig = (prev_m > absb) & in_bins
    m_dn = jnp.where(lane_eq0, -1.0, pltpu.roll(mag, shift=1, axis=2))
    m_up = jnp.where(lane_eqN, -1.0, pltpu.roll(mag, shift=Fp - 1, axis=2))
    anchored = sig & prev_sig & (mag >= m_dn) & (mag >= m_up)
    no_anchor = ~jnp.any(anchored, axis=-1, keepdims=True)
    m_masked = jnp.where(in_bins, mag, -1.0)
    is_gmax = m_masked == jnp.max(m_masked, axis=-1, keepdims=True)
    anchored = anchored | (no_anchor & sig & is_gmax)
    anc_ref[...] = anchored.astype(f32)
    sig_ref[...] = sig.astype(f32)

    # ---- serial fill (the offline kernel's frame_step, central parts only)
    def frame_step(tt, _):
        anc_f = anc_ref[:, tt, :]
        anch = anc_f > 0.5
        phi_t = phi_ref[...] + ct_ref[:, tt, :]
        a0 = 1.0 - anc_f
        b_up = jnp.where(anch, phi_t, sup_ref[:, tt, :])
        b_dn = jnp.where(anch, phi_t, sdn_ref[:, tt, :])
        a_u, f_up, d_up = _seg_scan(a0, b_up, a0, Fp, reverse=False)
        a_d, f_dn, d_dn = _seg_scan(a0, b_dn, a0, Fp, reverse=True)
        big = jnp.float32(10 * Fp)
        du = jnp.where(a_u == 0, d_up, big)
        dd = jnp.where(a_d == 0, d_dn, big)
        filled = jnp.where(du <= dd, f_up, f_dn)
        any_anchor = jnp.any(anch, axis=-1, keepdims=True)
        filled = jnp.where(any_anchor, filled, 0.0)
        phi = jnp.where(anch, phi_t, filled)
        phi = jnp.where(sig_ref[:, tt, :] > 0.5, phi, angles_ref[:, tt, :])
        phi_ref[...] = phi
        reim_ref[:, pl.ds(tt, 1), :Fp] = phi[:, None, :]
        return 0

    jax.lax.fori_loop(0, n_valid, frame_step, 0, unroll=False)
    phis = reim_ref[...][:, :, :Fp]

    # ---- carry the RT-PGHI state: last two COMMITTED magnitude rows
    mprev_ref[...] = mag[:, commit - 2: commit, :]
    return phis


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop", "T_c", "n_chunks", "Fp", "n_bins", "fmul", "tol",
        "interpret",
    ),
)
def _session_pghi_call(
    rows, ana_basis, syn_basis, angles,
    n_fft, hop, T_c, n_chunks, Fp, n_bins, fmul, tol, interpret,
):
    B = rows.shape[0]
    overlap = n_fft // hop
    kernel = functools.partial(
        _session_pghi_kernel,
        T_c=T_c, overlap=overlap, hop=hop, n_fft=n_fft, Fp=Fp,
        n_bins=n_bins, fmul=fmul, tol=tol,
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
            pl.BlockSpec(
                (B, T_c, Fp), lambda t: (0, t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, rows_out, out_w), lambda t: (0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_chunks * rows_out, out_w), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((B, 2, Fp), jnp.float32),        # mag carry (2 rows)
            pltpu.VMEM((B, Fp), jnp.float32),           # phase carry
            pltpu.VMEM((B, carry_rows, out_w), jnp.float32),  # OLA tail
            pltpu.VMEM((B, T_c, 2 * Fp), jnp.float32),  # phi | re | im
        ]
        + [pltpu.VMEM((B, T_c, Fp), jnp.float32) for _ in range(5)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rows, ana_basis, syn_basis, angles)


def make_fused_pghi_roundtrip(
    chain, chunk_size: int, key=None, interpret: Optional[bool] = None
):
    """Whole-session fused PHASELESS roundtrip ``fn(x) -> rec`` for a
    recognized ``[OverlapAdd, RealtimeSTFT-family]`` chain with
    ``inversion_mode="pghi"`` (see :func:`_session_pghi_kernel`).

    Output matches ``scan_roundtrip(chain, x, chunk, inversion_mode="pghi",
    key=key)`` chunk for chunk: the silent-bin random phases replicate the
    generic scan's exact key pipeline (per-chunk split, then the Compose
    ``step_invert`` child split), so the draws are bit-equal.  The whole
    session's angles materialize in HBM (see :func:`_session_angles`) —
    ~10 bytes per input sample at 1024/256; very long sessions should use
    the generic scan (the auto dispatch gates on this).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    oadd, rt = chain.transforms
    n_fft, hop = rt.n_fft, rt.hop_length
    T_c = chunk_size // hop
    F = n_fft // 2 + 1
    Fp = _round_up(F, LANE)
    carry_rows = n_fft // hop - 1
    fmul = float(rt.gamma) / (hop * n_fft)
    tol = float(rt.tolerance)

    ana_basis = _ana_basis(rt.window, n_fft, F, Fp)
    syn_basis = _syn_basis(
        rt.inv_window, n_fft, F, Fp,
        jnp.asarray(oadd.gain_compensation, jnp.float32),
    )

    def run(x: jnp.ndarray) -> jnp.ndarray:
        batch_shape = x.shape[:-1]
        L = x.shape[-1]
        n_chunks = -(-L // chunk_size)
        xb = x.reshape((-1, L))
        B = xb.shape[0]
        angles = _session_angles(key, n_chunks, T_c, F, Fp, batch_shape)
        total_rows = carry_rows + n_chunks * T_c + (_WIN_PAD - carry_rows)
        rows = _session_rows(xb, carry_rows, total_rows, hop)
        out = _run_batch_slabs(
            lambda r, a: _session_pghi_call(
                r, ana_basis, syn_basis, a,
                n_fft, hop, T_c, n_chunks, Fp, F, fmul, tol, interpret,
            ),
            B, _pghi_session_slab(n_fft, hop, T_c, Fp), rows, angles,
        )
        out = out.reshape(batch_shape + (n_chunks * T_c * hop,))
        return out[..., : n_chunks * chunk_size]

    return run


# ============================================== phaseless + GL polish
def fused_pghi_gl_roundtrip_available(chain, chunk_size: int) -> bool:
    """Gate for the fused ``inversion_mode="pghi_gl"`` session: the
    phaseless-session constraints, plus an aligned hop (the in-kernel GL
    projection re-frames the overlap-added samples, which needs hop-width
    OLA rows), and a GL context / lookahead each no longer than the chunk
    (``lookahead_frames`` pending magnitudes ride an extra VMEM carry —
    :func:`_session_pghi_gl_kernel`)."""
    from ...transforms.base import ComposeAudioTransform
    from ...transforms.oadd import OverlapAdd
    from ...transforms.stft import RealtimeSTFT

    if not isinstance(chain, ComposeAudioTransform) or len(chain) != 2:
        return False
    oadd, rt = chain.transforms
    if not isinstance(oadd, OverlapAdd) or not isinstance(rt, RealtimeSTFT):
        return False
    T_c = chunk_size // max(rt.hop_length, 1)
    return (
        fused_pghi_roundtrip_available(chain, chunk_size)
        and rt.hop_length % LANE == 0
        and 0 <= int(getattr(rt, "lookahead_frames", 0)) <= T_c
        and 0 < int(rt.gl_context) <= T_c
    )


def _session_pghi_gl_kernel(
    rows_ref, ana_basis_ref, syn_basis_ref, proj_basis_ref, angles_ref,
    o_ref, mprev_ref, phi_ref, tail_ref, reim_ref,
    ct_ref, sup_ref, sdn_ref, anc_ref, sig_ref, glm_ref, glp_ref, y_ref,
    *opt_refs,
    T_c, overlap, hop, n_fft, Fp, n_bins, fmul, tol, ctx, iters, la,
    from_mag=False,
):
    """One grid step of the ``pghi_gl`` session: the RT-PGHI fill seeds
    ``iters`` windowed Griffin-Lim consistency projections on the chunk's
    own frame grid, with the carried ``ctx`` committed frames *pinned*
    (``RealtimeSTFT.pghi_gl_stream`` semantics) — every projection is two
    stacked GEMMs + an in-VMEM overlap-add + re-frame, so the whole
    quality mode stays inside the kernel.  Extra VMEM carries vs the
    plain phaseless kernel: the pinned context magnitudes and phases
    (``gl_mag`` / ``gl_phase``).  Same anchor-flip parity contract as
    :func:`_session_pghi_kernel`.

    ``la`` > 0 is the bounded-lookahead mode (``lookahead_frames``,
    VERDICT r2 #9): commit is delayed by ``la`` frames, so every committed
    frame's projections saw >= ``la`` frames of ridge continuation.  The
    pending magnitudes ride an extra VMEM carry (``la_ref``); each step
    re-seeds and re-polishes them with the new chunk as future context
    and commits the first ``T_c`` of the ``la + T_c`` frames — exactly
    ``RealtimeSTFT.pghi_gl_stream``'s ``la_mag`` shuffle."""
    from .spectral import _atan2

    f32 = jnp.float32
    t = pl.program_id(0)
    B = rows_ref.shape[0]
    la_ref = opt_refs[0] if la else None
    T = T_c + la            # frames through the fill: pending + chunk
    Tp = reim_ref.shape[1]  # fill rows, 8-aligned (= _round_up(T, 8))
    # 8-align the extended grid: Mosaic gives roll/slice results over
    # non-8-multiple sublane extents nonzero layout offsets, which the
    # re-frame concat rejects ("offset mismatch on non-concat dimension").
    # The pad frames carry ZERO magnitude — they contribute nothing to the
    # projection's OLA and their (garbage) phases are never committed.
    Tx = _round_up(ctx + T, 8)
    Tv = ctx + T  # valid ext rows

    @pl.when(t == 0)
    def _init():
        mprev_ref[...] = jnp.zeros_like(mprev_ref)
        phi_ref[...] = jnp.zeros_like(phi_ref)
        tail_ref[...] = jnp.zeros_like(tail_ref)
        glm_ref[...] = jnp.zeros_like(glm_ref)
        glp_ref[...] = jnp.zeros_like(glp_ref)
        if la:
            la_ref[...] = jnp.zeros_like(la_ref)

    # from_mag: the invert-only (decode) session — the chunk's magnitudes
    # arrive directly as the first block (a model's output), no analysis
    mag_c = (
        rows_ref[...] if from_mag
        else _analyze_mag(rows_ref, ana_basis_ref, T_c, overlap, hop, Fp)
    )
    if la:
        # fill grid [pending la; chunk T_c; zero pad]: row-select build
        # (value-slice concats trip Mosaic's offset check; the roll's
        # wrap only moves zero pad — Tp - T_c >= la by construction)
        rowp = jax.lax.broadcasted_iota(jnp.int32, (B, Tp, Fp), 1)
        pad_c = jnp.pad(mag_c, [(0, 0), (0, Tp - T_c), (0, 0)])
        shifted_c = pltpu.roll(pad_c, shift=la, axis=1)
        la_pad = jnp.pad(la_ref[...], [(0, 0), (0, Tp - la), (0, 0)])
        mag = jnp.where(rowp < la, la_pad, shifted_c)
        mag = jnp.where(rowp < T, mag, 0.0)
    else:
        mag = mag_c
    ph0 = _rt_pghi_phases(
        mag, angles_ref, mprev_ref, phi_ref, reim_ref,
        ct_ref, sup_ref, sdn_ref, anc_ref, sig_ref,
        T_c=Tp, hop=hop, n_fft=n_fft, Fp=Fp, n_bins=n_bins,
        fmul=fmul, tol=tol, n_valid=T, commit=T_c,
    )

    # ---- extended grid [gl_ctx; pending + chunk; zero pad]
    rowx = jax.lax.broadcasted_iota(jnp.int32, (B, Tx, Fp), 1)
    lanex = jax.lax.broadcasted_iota(jnp.int32, (B, Tx, Fp), 2)

    def ext(ctx_rows_ref, vals):
        # rows [0, ctx) from the carried context ref, rows [ctx, Tv) from
        # the fill values (shifted down by ctx via a roll on a padded
        # layout — rows >= T of ``vals`` are masked below, so the roll's
        # wrap is harmless), rows [Tv, Tx) zero
        if Tx > Tp:
            pad = jnp.pad(vals, [(0, 0), (0, Tx - Tp), (0, 0)])
        else:
            pad = vals[:, :Tx, :]
        shifted = pltpu.roll(pad, shift=ctx, axis=1)
        ctx_pad = jnp.pad(ctx_rows_ref[...], [(0, 0), (0, Tx - ctx), (0, 0)])
        out = jnp.where(rowx < ctx, ctx_pad, shifted)
        return jnp.where(rowx < Tv, out, 0.0)

    mag_ext = ext(glm_ref, mag)
    ph_ext = ext(glp_ref, ph0)
    pinned = ph_ext  # rows < ctx hold the pinned context phases
    mm_ext = jnp.where(lanex < n_bins, mag_ext, 0.0)
    # Boundary freeze (r5; RealtimeSTFT.pghi_gl_stream's freeze_n): ext
    # rows committed THIS step that sit in the grid's right-context-
    # incomplete trailing ``overlap-1`` band keep the causal ``ph0``
    # instead of the GL update (at lookahead 0 the projection re-anchors
    # them WORSE than plain PGHI — decode SC 0.0388 vs 0.0133,
    # BENCH_r04).  Zero once ``la >= overlap-1``: those configurations
    # are bit-identical to the unfrozen polish.
    freeze_n = max(0, min(overlap - 1 - la, T_c))
    keep_rows = rowx < ctx
    if freeze_n:
        keep_rows = keep_rows | (
            (rowx >= ctx + T_c - freeze_n) & (rowx < ctx + T_c)
        )

    def project(_, phase):
        # projection GEMMs run bf16x3, not the session kernels' x4: the
        # iterated projections dominate the kernel's MACs, and at large B
        # the mode is GEMM-bound against a generic scan that also runs
        # bf16x3 (Precision.HIGH) — the 4th (lo x lo) term was the
        # measured 0.8-0.9x loss at B >= 32 (BENCH_NOTES.md r3.22b).  The
        # x3 operand stacks are PREFIXES of the stored x4 bases
        # ([hi; lo; hi] of [hi; lo; hi; lo]), so ref row slices reuse the
        # resident VMEM weights.  Seed analysis and the final committed
        # synthesis stay x4 (the accuracy-bearing steps).
        spec_flat = jnp.concatenate(
            [mm_ext * jnp.cos(phase), mm_ext * jnp.sin(phase)], axis=2
        ).reshape(B * Tx, 2 * Fp)
        zh, zl = _split_bf16(spec_flat)
        zstk = jnp.concatenate([zh, zh, zl], axis=1)
        td = jnp.dot(
            zstk, proj_basis_ref[: 6 * Fp, :], preferred_element_type=f32
        )
        # full OLA of the ext grid (aligned hop: acc rows ARE hop-sample
        # rows; the chain's project() OLAs exactly these frames).  Round
        # the accumulated value through VMEM scratch before the re-frame
        # rolls: the pad-built value carries nonzero sublane layout
        # offsets, and rolls of such values feed the frame concat with
        # mismatched offsets (Mosaic "offset mismatch on non-concat
        # dimension"); a ref read canonicalizes the layout, exactly like
        # the analysis stage's rows_ref read.
        acc, _ = ola_accumulate(td, B, Tx, overlap * hop, hop)
        y_ref[:, : Tx + overlap - 1, :] = acc
        yv = y_ref[...]
        n_rows = yv.shape[1]  # 8-aligned >= Tx + overlap - 1
        # frame i reads rows i..i+overlap-1 <= Tx+overlap-2 — the scratch's
        # alignment pad rows are never read
        parts = [
            pltpu.roll(yv, shift=(n_rows - j) % n_rows, axis=1)[:, :Tx, :]
            for j in range(overlap)
        ]
        fr = jnp.concatenate(parts, axis=2)  # (B, Tx, n_fft) re-framed
        fh, fl = _split_bf16(fr.reshape(B * Tx, overlap * hop))
        stk = jnp.concatenate([fh, fh, fl], axis=1)
        Z = jnp.dot(
            stk, ana_basis_ref[: 3 * (overlap * hop), :],
            preferred_element_type=f32,
        )
        Z3 = Z.reshape(B, Tx, 2 * Fp)
        new = _atan2(Z3[:, :, Fp:], Z3[:, :, :Fp])
        return jnp.where(keep_rows, pinned, new)

    phase = jax.lax.fori_loop(0, iters, project, ph_ext, unroll=False)

    # committed chunk rows: ext rows [ctx, ctx + T_c) shifted back up —
    # with lookahead the trailing ``la`` polished rows stay uncommitted
    # (their magnitudes carry; phases re-seed next step)
    ph = pltpu.roll(phase, shift=Tx - ctx, axis=1)[:, :T_c, :]
    mag_commit = mag[:, :T_c, :] if la else mag

    # ---- carries: polished last COMMITTED phase row (the generic scan's
    # phase_buffer = angle(committed spec)); context mags/phases; pending
    # magnitudes
    phi_ref[...] = ph[:, T_c - 1, :]
    glm_ref[...] = mag[:, T_c - ctx: T_c, :]
    glp_ref[...] = ph[:, T_c - ctx: T_c, :]
    if la:
        la_ref[...] = mag[:, T_c: T, :]

    lane3 = jax.lax.broadcasted_iota(jnp.int32, (B, T_c, Fp), 2)
    mm = jnp.where(lane3 < n_bins, mag_commit, 0.0)
    _synth_and_emit(
        mm, ph, reim_ref, syn_basis_ref, o_ref, tail_ref,
        T_c=T_c, overlap=overlap, hop=hop, Fp=Fp,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop", "T_c", "n_chunks", "Fp", "n_bins", "fmul", "tol",
        "ctx", "iters", "la", "from_mag", "interpret",
    ),
)
def _session_pghi_gl_call(
    rows, ana_basis, syn_basis, proj_basis, angles,
    n_fft, hop, T_c, n_chunks, Fp, n_bins, fmul, tol, ctx, iters, la,
    interpret, from_mag=False,
):
    B = rows.shape[0]
    overlap = n_fft // hop
    kernel = functools.partial(
        _session_pghi_gl_kernel,
        T_c=T_c, overlap=overlap, hop=hop, n_fft=n_fft, Fp=Fp,
        n_bins=n_bins, fmul=fmul, tol=tol, ctx=ctx, iters=iters, la=la,
        from_mag=from_mag,
    )
    rows_out, out_w, carry_rows = ola_layout(n_fft, hop, T_c)
    T = T_c + la            # frames through the fill per step
    Tp = _round_up(T, 8)    # fill rows (8-aligned)

    def fixed(m):
        return pl.BlockSpec(m.shape, lambda t: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            # from_mag (decode sessions): per-chunk magnitude blocks;
            # otherwise overlapping signal-row Element windows
            pl.BlockSpec(
                (B, T_c, Fp), lambda t: (0, t, 0), memory_space=pltpu.VMEM
            )
            if from_mag
            else pl.BlockSpec(
                (pl.Element(B), pl.Element(T_c + _WIN_PAD), pl.Element(hop)),
                lambda t: (0, t * T_c, 0),
                memory_space=pltpu.VMEM,
            ),
            fixed(ana_basis),
            fixed(syn_basis),
            fixed(proj_basis),
            # angles ride 8-aligned per-chunk blocks (Mosaic requires
            # blocked sublane extents divisible by 8; rows [T, Tp) are
            # alignment pad, never read — the fill stops at n_valid=T)
            pl.BlockSpec(
                (B, Tp, Fp), lambda t: (0, t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, rows_out, out_w), lambda t: (0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_chunks * rows_out, out_w), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((B, 2, Fp), jnp.float32),
            pltpu.VMEM((B, Fp), jnp.float32),
            pltpu.VMEM((B, carry_rows, out_w), jnp.float32),
            pltpu.VMEM((B, Tp, 2 * Fp), jnp.float32),
        ]
        + [pltpu.VMEM((B, Tp, Fp), jnp.float32) for _ in range(5)]
        + [pltpu.VMEM((B, ctx, Fp), jnp.float32) for _ in range(2)]
        + [
            pltpu.VMEM(
                # projection OLA round-trip; 8-aligned rows (layout
                # canonicalization for the re-frame rolls/concat)
                (
                    B,
                    _round_up(
                        _round_up(ctx + T, 8) + overlap - 1, 8
                    ),
                    hop,
                ),
                jnp.float32,
            )
        ]
        + ([pltpu.VMEM((B, la, Fp), jnp.float32)] if la else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rows, ana_basis, syn_basis, proj_basis, angles)


def make_fused_pghi_gl_roundtrip(
    chain, chunk_size: int, key=None, interpret: Optional[bool] = None
):
    """Whole-session fused ``pghi_gl`` roundtrip (see
    :func:`_session_pghi_gl_kernel`); same wrapper contract as
    :func:`make_fused_pghi_roundtrip` — the silent-bin draws replicate the
    generic scan's key pipeline bit-exactly."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    oadd, rt = chain.transforms
    n_fft, hop = rt.n_fft, rt.hop_length
    overlap = n_fft // hop
    T_c = chunk_size // hop
    F = n_fft // 2 + 1
    Fp = _round_up(F, LANE)
    carry_rows = overlap - 1
    fmul = float(rt.gamma) / (hop * n_fft)
    tol = float(rt.tolerance)
    ctx = int(rt.gl_context)
    iters = int(rt.gl_iterations)
    la = int(getattr(rt, "lookahead_frames", 0))

    ana_basis = _ana_basis(rt.window, n_fft, F, Fp)
    syn_basis = _syn_basis(
        rt.inv_window, n_fft, F, Fp,
        jnp.asarray(oadd.gain_compensation, jnp.float32),
    )
    # the GL projection divides its OLA by the frame multiplicity
    # (pghi_gl_stream's `y / overlap`), not the OverlapAdd gain
    proj_basis = _syn_basis(rt.inv_window, n_fft, F, Fp, jnp.float32(overlap))

    def run(x: jnp.ndarray) -> jnp.ndarray:
        batch_shape = x.shape[:-1]
        L = x.shape[-1]
        n_chunks = -(-L // chunk_size)
        xb = x.reshape((-1, L))
        B = xb.shape[0]
        # per-chunk draws cover the la pending frames re-entering the fill
        # (pghi_gl_stream passes [la_mag; chunk] to pghi_stream, whose draw
        # spans la + T_c frames); chunks pad to 8-aligned blocks for the
        # kernel's BlockSpec (pad rows never read)
        T = T_c + la
        Tp = _round_up(T, 8)
        angles = _session_angles(key, n_chunks, T, F, Fp, batch_shape)
        if Tp != T:
            angles = jnp.pad(
                angles.reshape((-1, n_chunks, T, Fp)),
                [(0, 0), (0, 0), (0, Tp - T), (0, 0)],
            ).reshape((-1, n_chunks * Tp, Fp))
        total_rows = carry_rows + n_chunks * T_c + (_WIN_PAD - carry_rows)
        rows = _session_rows(xb, carry_rows, total_rows, hop)
        out = _run_batch_slabs(
            lambda r, a: _session_pghi_gl_call(
                r, ana_basis, syn_basis, proj_basis, a,
                n_fft, hop, T_c, n_chunks, Fp, F, fmul, tol, ctx, iters,
                la, interpret,
            ),
            B, _pghi_session_slab(n_fft, hop, T_c, Fp, ctx=ctx, la=la),
            rows, angles,
        )
        out = out.reshape(batch_shape + (n_chunks * T_c * hop,))
        return out[..., : n_chunks * chunk_size]

    return run


# ===================================================== invert-only (decode)
# The decode twins of the phaseless session kernels: a model's magnitude
# frames arrive from HBM (``streaming.scan_invert``'s input) and the chunk's
# analysis GEMM disappears — everything downstream (RT-PGHI fill, GL polish,
# synthesis, OLA tail carry) is shared with the roundtrip kernels, so a fix
# cannot diverge.  The key pipeline replicates ``scan_invert``'s generic
# scan (one key per chunk, then the Compose step_invert child split), so
# the silent-bin/uniform draws are bit-equal.

def _invert_chunk_size(chain, chunk_frames: int) -> Optional[int]:
    """``chunk_frames * hop`` for a recognized 2-chain, else ``None`` —
    lets the invert gates reuse the roundtrip gates verbatim."""
    from ...transforms.base import ComposeAudioTransform
    from ...transforms.stft import RealtimeSTFT

    if not isinstance(chain, ComposeAudioTransform) or len(chain) != 2:
        return None
    rt = chain.transforms[1]
    if not isinstance(rt, RealtimeSTFT):
        return None
    return chunk_frames * rt.hop_length


def fused_random_invert_available(chain, chunk_frames: int) -> bool:
    """Gate for the fused ``inversion_mode="random"`` decode session."""
    cs = _invert_chunk_size(chain, chunk_frames)
    return cs is not None and fused_random_roundtrip_available(chain, cs)


def fused_pghi_invert_available(chain, chunk_frames: int) -> bool:
    """Gate for the fused ``inversion_mode="pghi"`` decode session."""
    cs = _invert_chunk_size(chain, chunk_frames)
    return cs is not None and fused_pghi_roundtrip_available(chain, cs)


def fused_pghi_gl_invert_available(chain, chunk_frames: int) -> bool:
    """Gate for the fused ``inversion_mode="pghi_gl"`` decode session."""
    cs = _invert_chunk_size(chain, chunk_frames)
    return cs is not None and fused_pghi_gl_roundtrip_available(chain, cs)


def _session_mags(yb, n_frames_total: int, F: int, Fp: int):
    """Frame-major magnitudes ``(B, T, F)`` -> zero-padded
    ``(B, n_frames_total, Fp)`` (pad frames have zero magnitude — they
    contribute nothing through the OLA; pad lanes are masked in-kernel)."""
    B, T, _ = yb.shape
    return jnp.pad(yb, [(0, 0), (0, n_frames_total - T), (0, Fp - F)])


def _session_random_invert_kernel(
    mag_ref, syn_basis_ref, angles_ref, o_ref, tail_ref, reim_ref,
    *, T_k, overlap, hop, Fp, n_bins,
):
    """Decode twin of :func:`_session_random_kernel`: magnitudes arrive
    directly, phases are the precomputed uniform draws, synthesis + OLA
    with the carried tail (the only state — grid steps may regroup chunks
    exactly like the roundtrip kernel's)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        tail_ref[...] = jnp.zeros_like(tail_ref)

    mag = mag_ref[...]
    lane3 = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 2)
    mm = jnp.where(lane3 < n_bins, mag, 0.0)
    _synth_and_emit(
        mm, angles_ref[...], reim_ref, syn_basis_ref, o_ref, tail_ref,
        T_c=T_k, overlap=overlap, hop=hop, Fp=Fp, x3=True,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop", "T_k", "n_steps", "Fp", "n_bins", "interpret",
    ),
)
def _session_random_invert_call(
    mags, syn_basis, angles, n_fft, hop, T_k, n_steps, Fp, n_bins, interpret,
):
    B = mags.shape[0]
    overlap = n_fft // hop
    kernel = functools.partial(
        _session_random_invert_kernel,
        T_k=T_k, overlap=overlap, hop=hop, Fp=Fp, n_bins=n_bins,
    )
    rows_out, out_w, carry_rows = ola_layout(n_fft, hop, T_k)

    def fixed(m):
        return pl.BlockSpec(m.shape, lambda t: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (B, T_k, Fp), lambda t: (0, t, 0), memory_space=pltpu.VMEM
            ),
            fixed(syn_basis),
            pl.BlockSpec(
                (B, T_k, Fp), lambda t: (0, t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, rows_out, out_w), lambda t: (0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_steps * rows_out, out_w), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((B, carry_rows, out_w), jnp.float32),  # OLA tail
            pltpu.VMEM((B, T_k, 2 * Fp), jnp.float32),        # re | im
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mags, syn_basis, angles)


def make_fused_random_invert(
    chain, chunk_frames: int, key=None, interpret: Optional[bool] = None,
    pre_splits: int = 0,
):
    """Whole-session fused random-phase DECODE ``fn(mags (..., T, F)) ->
    audio (..., T * hop)``; output matches ``scan_invert(chain, mags,
    chunk_frames, inversion_mode="random", key=key)`` (bit-equal draws,
    see module decode notes)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    oadd, rt = chain.transforms
    n_fft, hop = rt.n_fft, rt.hop_length
    T_c = chunk_frames
    F = n_fft // 2 + 1
    Fp = _round_up(F, LANE)

    syn_basis = _syn_basis(
        rt.inv_window, n_fft, F, Fp,
        jnp.asarray(oadd.gain_compensation, jnp.float32),
    )

    def run(y: jnp.ndarray) -> jnp.ndarray:
        batch_shape = y.shape[:-2]
        T = y.shape[-2]
        n_chunks = -(-T // T_c)
        n_frames = n_chunks * T_c
        yb = y.reshape((-1, T, F))
        B = yb.shape[0]
        angles = _session_angles(
            key, n_chunks, T_c, F, Fp, batch_shape, pre_splits=pre_splits
        )
        unit = ola_tile_unit(hop)
        # same VMEM-product policy as the roundtrip random session
        slab = max(8, (512 // unit) // 8 * 8)
        Bs = min(B, slab)
        T_k = min(
            _round_up(n_frames, unit),
            128,
            max(unit, _round_up(512 // Bs, unit)),
        )
        n_steps = -(-n_frames // T_k)
        mags = _session_mags(yb, n_steps * T_k, F, Fp)
        angles = jnp.pad(
            angles, [(0, 0), (0, n_steps * T_k - n_frames), (0, 0)]
        )
        out = _run_batch_slabs(
            lambda m, a: _session_random_invert_call(
                m, syn_basis, a, n_fft, hop, T_k, n_steps, Fp, F, interpret
            ),
            B, slab, mags, angles,
        )
        out = out.reshape(batch_shape + (n_steps * T_k * hop,))
        return out[..., : T * hop]

    return run


def _session_pghi_invert_kernel(
    mag_ref, syn_basis_ref, angles_ref,
    o_ref, mprev_ref, phi_ref, tail_ref, reim_ref,
    ct_ref, sup_ref, sdn_ref, anc_ref, sig_ref,
    *, T_c, overlap, hop, n_fft, Fp, n_bins, fmul, tol,
):
    """Decode twin of :func:`_session_pghi_kernel`: the chunk's magnitudes
    arrive directly; RT-PGHI fill + synthesis + OLA identical, with the
    same VMEM-resident streaming state (grid step = one chunk — the
    per-chunk threshold is a chunk statistic)."""
    t = pl.program_id(0)
    B = mag_ref.shape[0]

    @pl.when(t == 0)
    def _init():
        mprev_ref[...] = jnp.zeros_like(mprev_ref)
        phi_ref[...] = jnp.zeros_like(phi_ref)
        tail_ref[...] = jnp.zeros_like(tail_ref)

    mag = mag_ref[...]
    phis = _rt_pghi_phases(
        mag, angles_ref, mprev_ref, phi_ref, reim_ref,
        ct_ref, sup_ref, sdn_ref, anc_ref, sig_ref,
        T_c=T_c, hop=hop, n_fft=n_fft, Fp=Fp, n_bins=n_bins,
        fmul=fmul, tol=tol,
    )
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (B, T_c, Fp), 2)
    mm = jnp.where(lane3 < n_bins, mag, 0.0)
    _synth_and_emit(
        mm, phis, reim_ref, syn_basis_ref, o_ref, tail_ref,
        T_c=T_c, overlap=overlap, hop=hop, Fp=Fp,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop", "T_c", "n_chunks", "Fp", "n_bins", "fmul", "tol",
        "interpret",
    ),
)
def _session_pghi_invert_call(
    mags, syn_basis, angles,
    n_fft, hop, T_c, n_chunks, Fp, n_bins, fmul, tol, interpret,
):
    B = mags.shape[0]
    overlap = n_fft // hop
    kernel = functools.partial(
        _session_pghi_invert_kernel,
        T_c=T_c, overlap=overlap, hop=hop, n_fft=n_fft, Fp=Fp,
        n_bins=n_bins, fmul=fmul, tol=tol,
    )
    rows_out, out_w, carry_rows = ola_layout(n_fft, hop, T_c)

    def fixed(m):
        return pl.BlockSpec(m.shape, lambda t: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (B, T_c, Fp), lambda t: (0, t, 0), memory_space=pltpu.VMEM
            ),
            fixed(syn_basis),
            pl.BlockSpec(
                (B, T_c, Fp), lambda t: (0, t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, rows_out, out_w), lambda t: (0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_chunks * rows_out, out_w), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((B, 2, Fp), jnp.float32),        # mag carry (2 rows)
            pltpu.VMEM((B, Fp), jnp.float32),           # phase carry
            pltpu.VMEM((B, carry_rows, out_w), jnp.float32),  # OLA tail
            pltpu.VMEM((B, T_c, 2 * Fp), jnp.float32),  # phi | re | im
        ]
        + [pltpu.VMEM((B, T_c, Fp), jnp.float32) for _ in range(5)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mags, syn_basis, angles)


def make_fused_pghi_invert(
    chain, chunk_frames: int, key=None, interpret: Optional[bool] = None,
    pre_splits: int = 0,
):
    """Whole-session fused RT-PGHI DECODE ``fn(mags (..., T, F)) ->
    audio (..., T * hop)``; matches ``scan_invert(chain, mags,
    chunk_frames, inversion_mode="pghi", key=key)`` under the roundtrip
    kernels' quality-parity contract (:func:`_session_pghi_kernel`)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    oadd, rt = chain.transforms
    n_fft, hop = rt.n_fft, rt.hop_length
    T_c = chunk_frames
    F = n_fft // 2 + 1
    Fp = _round_up(F, LANE)
    fmul = float(rt.gamma) / (hop * n_fft)
    tol = float(rt.tolerance)

    syn_basis = _syn_basis(
        rt.inv_window, n_fft, F, Fp,
        jnp.asarray(oadd.gain_compensation, jnp.float32),
    )

    def run(y: jnp.ndarray) -> jnp.ndarray:
        batch_shape = y.shape[:-2]
        T = y.shape[-2]
        n_chunks = -(-T // T_c)
        yb = y.reshape((-1, T, F))
        B = yb.shape[0]
        angles = _session_angles(
            key, n_chunks, T_c, F, Fp, batch_shape, pre_splits=pre_splits
        )
        mags = _session_mags(yb, n_chunks * T_c, F, Fp)
        out = _run_batch_slabs(
            lambda m, a: _session_pghi_invert_call(
                m, syn_basis, a,
                n_fft, hop, T_c, n_chunks, Fp, F, fmul, tol, interpret,
            ),
            B, _pghi_session_slab(n_fft, hop, T_c, Fp, mag_in=True),
            mags, angles,
        )
        out = out.reshape(batch_shape + (n_chunks * T_c * hop,))
        return out[..., : T * hop]

    return run


def make_fused_pghi_gl_invert(
    chain, chunk_frames: int, key=None, interpret: Optional[bool] = None,
    pre_splits: int = 0,
):
    """Whole-session fused ``pghi_gl`` DECODE ``fn(mags (..., T, F)) ->
    audio (..., T * hop)`` — the RT-PGHI seed + pinned-context GL polish
    of :func:`_session_pghi_gl_kernel` with the magnitudes arriving
    directly (``from_mag``); bounded lookahead included.  Matches
    ``scan_invert(chain, mags, chunk_frames, inversion_mode="pghi_gl",
    key=key)``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    oadd, rt = chain.transforms
    n_fft, hop = rt.n_fft, rt.hop_length
    overlap = n_fft // hop
    T_c = chunk_frames
    F = n_fft // 2 + 1
    Fp = _round_up(F, LANE)
    fmul = float(rt.gamma) / (hop * n_fft)
    tol = float(rt.tolerance)
    ctx = int(rt.gl_context)
    iters = int(rt.gl_iterations)
    la = int(getattr(rt, "lookahead_frames", 0))

    ana_basis = _ana_basis(rt.window, n_fft, F, Fp)
    syn_basis = _syn_basis(
        rt.inv_window, n_fft, F, Fp,
        jnp.asarray(oadd.gain_compensation, jnp.float32),
    )
    proj_basis = _syn_basis(rt.inv_window, n_fft, F, Fp, jnp.float32(overlap))

    def run(y: jnp.ndarray) -> jnp.ndarray:
        batch_shape = y.shape[:-2]
        T = y.shape[-2]
        n_chunks = -(-T // T_c)
        yb = y.reshape((-1, T, F))
        B = yb.shape[0]
        Tf = T_c + la
        Tp = _round_up(Tf, 8)
        angles = _session_angles(
            key, n_chunks, Tf, F, Fp, batch_shape, pre_splits=pre_splits
        )
        if Tp != Tf:
            angles = jnp.pad(
                angles.reshape((-1, n_chunks, Tf, Fp)),
                [(0, 0), (0, 0), (0, Tp - Tf), (0, 0)],
            ).reshape((-1, n_chunks * Tp, Fp))
        mags = _session_mags(yb, n_chunks * T_c, F, Fp)
        out = _run_batch_slabs(
            lambda m, a: _session_pghi_gl_call(
                m, ana_basis, syn_basis, proj_basis, a,
                n_fft, hop, T_c, n_chunks, Fp, F, fmul, tol, ctx, iters,
                la, interpret, from_mag=True,
            ),
            B, _pghi_session_slab(
                n_fft, hop, T_c, Fp, ctx=ctx, la=la, mag_in=True
            ),
            mags, angles,
        )
        out = out.reshape(batch_shape + (n_chunks * T_c * hop,))
        return out[..., : T * hop]

    return run


# ===================================================== encode-only sessions

def fused_forward_session_available(chain, chunk_size: int) -> bool:
    """Gate for the fused ENCODE session (audio -> complex frames, the
    model-feature serving path): the complex roundtrip kernel's layout
    constraints — the framing ring is realized as overlapping Element
    windows, exactly like every session kernel's analysis stage."""
    return fused_roundtrip_available(chain, chunk_size)


def _session_forward_kernel(
    rows_ref, ana_basis_ref, o_ref, *, T_k, overlap, hop, Fp,
):
    """One grid step of the encode session: frame assembly + stacked
    bf16x4 windowed DFT, spectrum straight to HBM as ``[re | im]`` lanes.
    No carried state at all (the ring is the Element-window overlap), so
    grid steps regroup chunks freely like the complex roundtrip's."""
    f32 = jnp.float32
    rows = rows_ref[...]
    B = rows.shape[0]
    n_rows = rows.shape[1]
    parts = [
        pltpu.roll(rows, shift=(n_rows - j) % n_rows, axis=1)[:, :T_k, :]
        for j in range(overlap)
    ]
    frames = jnp.concatenate(parts, axis=2)
    flat = frames.reshape(B * T_k, overlap * hop)
    fh, fl = _split_bf16(flat)
    stacked = jnp.concatenate([fh, fh, fl, fl], axis=1)
    Z = jnp.dot(stacked, ana_basis_ref[...], preferred_element_type=f32)
    o_ref[...] = Z.reshape(B, T_k, 2 * Fp)


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "T_k", "n_steps", "Fp", "interpret"),
)
def _session_forward_call(
    rows, ana_basis, n_fft, hop, T_k, n_steps, Fp, interpret,
):
    B = rows.shape[0]
    overlap = n_fft // hop
    kernel = functools.partial(
        _session_forward_kernel, T_k=T_k, overlap=overlap, hop=hop, Fp=Fp,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(B), pl.Element(T_k + _WIN_PAD), pl.Element(hop)),
                lambda t: (0, t * T_k, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                ana_basis.shape, lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, T_k, 2 * Fp), lambda t: (0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_steps * T_k, 2 * Fp), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rows, ana_basis)


def make_fused_forward_session(
    chain, chunk_size: int, interpret: Optional[bool] = None
):
    """Whole-session fused ENCODE ``fn(x (..., L)) -> (frames complex
    (..., T, F), final_state)`` for a recognized ``[OverlapAdd,
    RealtimeSTFT-family]`` chain; matches ``scan_forward(chain, x,
    chunk_size)`` (the forward never touches state past the framing ring,
    so the final state is the init state with the ring = the padded
    signal's tail)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    oadd, rt = chain.transforms
    n_fft, hop = rt.n_fft, rt.hop_length
    T_c = chunk_size // hop
    F = n_fft // 2 + 1
    Fp = _round_up(F, LANE)
    carry_rows = n_fft // hop - 1

    ana_basis = _ana_basis(rt.window, n_fft, F, Fp)

    def run(x: jnp.ndarray):
        batch_shape = x.shape[:-1]
        L = x.shape[-1]
        n_chunks = -(-L // chunk_size)
        n_frames = n_chunks * T_c
        xb = x.reshape((-1, L))
        B = xb.shape[0]
        unit = ola_tile_unit(hop)
        # same VMEM-product policy as the complex roundtrip session
        slab = max(8, (1024 // unit) // 8 * 8)
        Bs = min(B, slab)
        T_k = min(
            _round_up(n_frames, unit),
            128,
            max(unit, _round_up(1024 // Bs, unit)),
        )
        n_steps = -(-n_frames // T_k)
        total_rows = carry_rows + n_steps * T_k + (_WIN_PAD - carry_rows)
        rows = _session_rows(xb, carry_rows, total_rows, hop)
        out = _run_batch_slabs(
            lambda r: _session_forward_call(
                r, ana_basis, n_fft, hop, T_k, n_steps, interpret=interpret,
                Fp=Fp,
            ),
            B, slab, rows,
        )
        out = out[:, :n_frames, :]
        spec = jax.lax.complex(out[..., :F], out[..., Fp: Fp + F])
        spec = spec.reshape(batch_shape + (n_frames, F))
        # final state in closed form: the framing ring carries the padded
        # signal's last (overlap-1)*hop samples; nothing else moves
        state = chain.init_state(batch_shape)
        carry = carry_rows * hop
        pad = n_chunks * chunk_size - L
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)]) if pad else x
        if carry > 0:
            tail = jnp.concatenate(
                [state[0]["input_buffer"], xp], axis=-1
            )[..., -carry:]
            state[0] = dict(state[0], input_buffer=tail)
        return spec, state

    return run


def fused_complex_invert_available(chain, chunk_frames: int) -> bool:
    """Gate for the fused complex (explicit-phase) decode session."""
    cs = _invert_chunk_size(chain, chunk_frames)
    return cs is not None and fused_roundtrip_available(chain, cs)


def _session_complex_invert_kernel(
    spec_ref, syn_basis_ref, o_ref, tail_ref, *, T_k, overlap, hop, Fp,
):
    """Complex decode: the ``[re | im]`` spectrum arrives directly from
    HBM; stacked bf16x4 windowed iDFT + OLA with the carried tail (the
    roundtrip :func:`_session_kernel`'s synthesis half)."""
    f32 = jnp.float32
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        tail_ref[...] = jnp.zeros_like(tail_ref)

    B = spec_ref.shape[0]
    flat = spec_ref[...].reshape(B * T_k, 2 * Fp)
    zh, zl = _split_bf16(flat)
    zstk = jnp.concatenate([zh, zh, zl, zl], axis=1)
    td = jnp.dot(zstk, syn_basis_ref[...], preferred_element_type=f32)
    acc, S = ola_accumulate(td, B, T_k, overlap * hop, hop)
    acc = acc + jnp.concatenate(
        [tail_ref[...], jnp.zeros((B, S, acc.shape[-1]), f32)], axis=1
    )
    o_ref[...] = acc[:, :S, :]
    tail_ref[...] = acc[:, S:, :]


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "T_k", "n_steps", "Fp", "interpret"),
)
def _session_complex_invert_call(
    spec, syn_basis, n_fft, hop, T_k, n_steps, Fp, interpret,
):
    B = spec.shape[0]
    overlap = n_fft // hop
    kernel = functools.partial(
        _session_complex_invert_kernel,
        T_k=T_k, overlap=overlap, hop=hop, Fp=Fp,
    )
    rows_out, out_w, carry_rows = ola_layout(n_fft, hop, T_k)
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (B, T_k, 2 * Fp), lambda t: (0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                syn_basis.shape, lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, rows_out, out_w), lambda t: (0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_steps * rows_out, out_w), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((B, carry_rows, out_w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(spec, syn_basis)


def make_fused_complex_invert(
    chain, chunk_frames: int, interpret: Optional[bool] = None
):
    """Whole-session fused complex DECODE ``fn(spec complex (..., T, F))
    -> audio (..., T * hop)`` — the explicit-phase (keep_input-style)
    serving path; matches ``scan_invert(chain, spec, chunk_frames)``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    oadd, rt = chain.transforms
    n_fft, hop = rt.n_fft, rt.hop_length
    T_c = chunk_frames
    F = n_fft // 2 + 1
    Fp = _round_up(F, LANE)

    syn_basis = _syn_basis(
        rt.inv_window, n_fft, F, Fp,
        jnp.asarray(oadd.gain_compensation, jnp.float32),
    )

    def run(y: jnp.ndarray) -> jnp.ndarray:
        batch_shape = y.shape[:-2]
        T = y.shape[-2]
        n_chunks = -(-T // T_c)
        n_frames = n_chunks * T_c
        yb = y.reshape((-1, T, F))
        B = yb.shape[0]
        unit = ola_tile_unit(hop)
        # the [re|im] block + no angles ~ the complex roundtrip's budget
        slab = max(8, (1024 // unit) // 8 * 8)
        Bs = min(B, slab)
        T_k = min(
            _round_up(n_frames, unit),
            128,
            max(unit, _round_up(1024 // Bs, unit)),
        )
        n_steps = -(-n_frames // T_k)
        spec = jnp.concatenate(
            [
                _session_mags(jnp.real(yb), n_steps * T_k, F, Fp),
                _session_mags(jnp.imag(yb), n_steps * T_k, F, Fp),
            ],
            axis=-1,
        )
        out = _run_batch_slabs(
            lambda s: _session_complex_invert_call(
                s, syn_basis, n_fft, hop, T_k, n_steps, Fp, interpret
            ),
            B, slab, spec,
        )
        out = out.reshape(batch_shape + (n_steps * T_k * hop,))
        return out[..., : T * hop]

    return run
