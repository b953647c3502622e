"""Scan-based chunked processing of streaming transform chains.

The reference's realtime story is a Python loop feeding chunks through
stateful modules (reference test loop, acids_transforms/transforms/
stft.py:324-352).  Here the chain state is an explicit pytree
(``chain.init_state``) and a whole chunked session compiles to ONE
``lax.scan`` — state threading, analysis, processing and synthesis all fused
on device, no per-chunk Python or host round-trips.

Typical use::

    chain = OverlapAdd(1024, 256) + RealtimeSTFT(n_fft=1024, hop_length=256)
    y = scan_roundtrip(chain, x, chunk_size=4096)        # analysis+resynthesis
    frames, state = scan_forward(chain, x, 4096)          # analysis only
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .transforms.base import AudioTransform

__all__ = [
    "chunk_signal",
    "plan_forward",
    "plan_invert",
    "plan_roundtrip",
    "scan_forward",
    "scan_invert",
    "scan_roundtrip",
    "session_frame_times",
]


def _session_parts(chain):
    """Recognize ``[OverlapAdd, RealtimeSTFT]`` and ``[OverlapAdd,
    RealtimeSTFT, Magnitude]`` session chains.  Returns ``(two_chain,
    mag_t, pre_splits)`` — the framing+spectral 2-chain the session
    kernels cover, the (stateless, frame-local) Magnitude to apply
    whole-session in XLA around them, and the number of Compose
    ``step_invert`` key splits consumed by children to the RealtimeSTFT's
    right — or ``None`` when unrecognized."""
    from .transforms.base import ComposeAudioTransform
    from .transforms.oadd import OverlapAdd
    from .transforms.spectral_repr import Magnitude
    from .transforms.stft import RealtimeSTFT

    if not isinstance(chain, ComposeAudioTransform):
        return None
    ts = chain.transforms
    if (
        len(ts) == 2
        and isinstance(ts[0], OverlapAdd)
        and isinstance(ts[1], RealtimeSTFT)
    ):
        return chain, None, 0
    if (
        len(ts) == 3
        and isinstance(ts[0], OverlapAdd)
        and isinstance(ts[1], RealtimeSTFT)
        and type(ts[2]) is Magnitude
    ):
        return ts[0] + ts[1], ts[2], 1
    return None


def _sinebank_layout_ok(sub2) -> bool:
    """Layout gate for the sinebank closed form (mirrors
    ``fused_roundtrip_available``'s matching-(n_fft, hop) checks):
    :func:`_sinebank_session` overlap-adds with ``rt.hop_length`` and
    divides by the OverlapAdd's gain, which only equals the generic
    scan's ``OverlapAdd.step_invert`` ring recombination when the two
    transforms agree on (n_fft, hop)."""
    ola_t, rt = sub2.transforms[0], sub2.transforms[1]
    return ola_t.n_fft == rt.n_fft and ola_t.hop_length == rt.hop_length


def _sinebank_fits(sub2, mag_shape, chunk_frames: int) -> bool:
    """Footprint gate for dispatching the sinebank closed form on
    ``backend='auto'``: it materializes whole-session ``(B, T, F)``
    angle/sin/cos arrays and a ``(B, T, n_fft)`` frame tensor, so cap the
    dominant frame buffer at the same 1 GiB the phaseless kernels use for
    their session angle buffers (``angles_fit``) and hand oversized
    sessions back to the generic chunked scan (``backend='fused'`` may
    still force the closed form)."""
    rt = sub2.transforms[1]
    batch_elems = 1
    for d in mag_shape[:-2]:
        batch_elems *= d
    T = -(-mag_shape[-2] // chunk_frames) * chunk_frames
    frame_bytes = batch_elems * T * rt.n_fft * 4
    return frame_bytes <= 1 << 30


def _sinebank_session(sub2, mag: jnp.ndarray, chunk_frames: int) -> jnp.ndarray:
    """Closed-form whole-session sinebank decode (no scan, no kernel).

    The sinebank's only carried state is a deterministic ``time_index``
    (``t_{i+1} = t_i + T_c * hop / sr``) and the fixed ``random_phase``
    draw (``RealtimeSTFT.init_state``), so unlike the PGHI/GL modes the
    whole session is a closed form: per-frame oscillator phases for ALL
    frames at once, the two angle-addition GEMMs of
    ``RealtimeSTFT.sinebank_stream`` at session size, and one offline
    overlap-add (== the chunked ring recombination of
    ``OverlapAdd.step_invert`` — every output sample sums the same frame
    contributions).  The ``time_index`` f32 accumulation is replicated
    step by step (a direct ``i*d`` product would detune long sessions),
    so parity with the generic scan is bounded by single-ulp angle
    jitter only: XLA fuses ``omega*(t + t_i)`` differently across
    program contexts (the scan is not even bit-stable against an eager
    per-chunk loop of its own body), and one ulp of a ~1e4-rad
    oscillator phase moves ``sin`` by ~1e-3 — measured whole-session
    parity is 2-6e-4 relative L2 at 1-2 s sessions, identical spectra.
    """
    import numpy as np

    from .ops.framing import overlap_add

    ola_t, rt = sub2.transforms[0], sub2.transforms[1]
    T = mag.shape[-2]
    n = -(-T // chunk_frames)
    pad = n * chunk_frames - T
    if pad:
        mag = jnp.pad(mag, [(0, 0)] * (mag.ndim - 2) + [(0, pad), (0, 0)])
    # same random_phase draw as the generic scan's init_state (rng leaf)
    state = sub2.init_state(mag.shape[:-2], mode="sinebank")
    rp = state[1]["random_phase"]  # (..., 1, F)
    n_bins = mag.shape[-1]
    omega = 2.0 * jnp.pi * jnp.linspace(0.0, rt.sr / 2.0, n_bins)
    # frame times: local offsets exactly as sinebank_stream, plus the
    # carried time_index sequence replicated in f32 (t_i accumulates by
    # repeated addition in the scan — a direct i*d product would differ
    # in ulps and detune long sessions)
    frame_t = jnp.arange(chunk_frames)[:, None] * (rt.hop_length / rt.sr)
    d = np.float32(chunk_frames * rt.hop_length / rt.sr)
    t_seq = np.zeros(n, np.float32)
    for i in range(1, n):
        t_seq[i] = np.float32(t_seq[i - 1] + d)
    ft = (frame_t[None] + jnp.asarray(t_seq)[:, None, None]).reshape(
        n * chunk_frames, 1
    )
    A = omega[None, :] * ft + rp
    ns = jnp.arange(rt.n_fft)[None, :] / rt.sr
    C = jnp.cos(omega[:, None] * ns)
    S = jnp.sin(omega[:, None] * ns)
    prec = jax.lax.Precision.HIGHEST
    frames = (
        jnp.matmul(mag * jnp.sin(A), C, precision=prec)
        + jnp.matmul(mag * jnp.cos(A), S, precision=prec)
    ) / n_bins
    frames = frames * rt.inv_window
    y = overlap_add(frames, rt.hop_length)
    y = y[..., : n * chunk_frames * rt.hop_length] / ola_t.gain_compensation
    return y[..., : T * rt.hop_length]


def _batch_elems(shape) -> int:
    n = 1
    for d in shape:
        n *= d
    return n


def _cap_ok(mode: str, batch_elems: int) -> bool:
    from .regions import batch_cap

    cap = batch_cap(mode)
    return cap is None or batch_elems <= cap


def _angles_fit(rt, batch_elems: int, n_frames: int) -> bool:
    """Whole-session angle-buffer footprint gate for the phaseless session
    kernels (the wrappers materialize (B, T, Fp) f32 angles in HBM)."""
    from .ops.pallas.spectral import LANE, _round_up
    from .regions import angle_cap_bytes

    angle_bytes = batch_elems * n_frames * _round_up(
        rt.n_fft // 2 + 1, LANE
    ) * 4
    return angle_bytes <= angle_cap_bytes()


def _platform(platform: Optional[str]) -> str:
    return jax.default_backend() if platform is None else platform


def plan_forward(
    chain: AudioTransform,
    x_shape: Tuple[int, ...],
    chunk_size: int,
    has_state: bool = False,
    backend: str = "auto",
    platform: Optional[str] = None,
) -> str:
    """The :func:`scan_forward` dispatch decision, as data.

    Returns ``"fused"`` (whole-session encode kernel) or ``"generic"``
    (chain scan).  This IS the decision ``scan_forward`` executes — the
    scan body calls this planner, so the conformance suite
    (tests/test_regions.py) exercises the live dispatch, and every
    numeric gate loads from dispatch_regions.json (regions.py).
    Raises exactly like the scan API: unknown ``backend``, and
    ``backend="fused"`` with no covering kernel.
    """
    from .ops.pallas.stream_step import fused_forward_session_available

    if backend not in ("auto", "fused", "generic"):
        raise ValueError(
            "unknown scan_forward backend %r (use 'auto', 'fused' or "
            "'generic')" % backend
        )
    parts = _session_parts(chain)
    sub2 = parts[0] if parts else chain
    available = (
        not has_state
        and parts is not None
        and fused_forward_session_available(sub2, chunk_size)
    )
    if backend == "fused" and not available:
        raise ValueError(
            "backend='fused' requested but the fused encode-session kernel "
            "cannot cover this call (needs a fresh-state "
            "[OverlapAdd, RealtimeSTFT(, Magnitude)] chain with an "
            "OLA-supported layout); use backend='auto' to fall back to "
            "the generic scan"
        )
    take = backend == "fused" or (
        backend == "auto" and _platform(platform) == "tpu"
    )
    # measured encode crossover (r4.5 re-measure: 1.36x/1.19x at B=1/4,
    # neutral above — large fleets amortize XLA's dispatch)
    if available and take and (
        backend == "fused" or _cap_ok("encode", _batch_elems(x_shape[:-1]))
    ):
        return "fused"
    return "generic"


def plan_invert(
    chain: AudioTransform,
    y_shape: Tuple[int, ...],
    chunk_frames: int,
    inversion_mode: Optional[str] = None,
    y_is_complex: bool = False,
    backend: str = "auto",
    platform: Optional[str] = None,
) -> str:
    """The :func:`scan_invert` dispatch decision, as data.

    Returns ``"sinebank"`` (closed form), ``"complex"`` / ``"pghi"`` /
    ``"pghi_gl"`` / ``"random"`` (whole-session invert kernels) or
    ``"generic"`` — see :func:`plan_forward` for the contract.
    """
    from .ops.pallas.stream_step import (
        fused_complex_invert_available,
        fused_pghi_gl_invert_available,
        fused_pghi_invert_available,
        fused_random_invert_available,
    )

    if backend not in ("auto", "fused", "generic"):
        raise ValueError(
            "unknown scan_invert backend %r (use 'auto', 'fused' or "
            "'generic')" % backend
        )
    batch_elems = _batch_elems(y_shape[:-2])
    parts = _session_parts(chain)
    sub2, mag_t, _ = parts if parts else (chain, None, 0)
    pghi_available = (
        inversion_mode == "pghi"
        and parts is not None
        and fused_pghi_invert_available(sub2, chunk_frames)
    )
    pghi_gl_available = (
        inversion_mode == "pghi_gl"
        and parts is not None
        and fused_pghi_gl_invert_available(sub2, chunk_frames)
    )
    random_available = (
        inversion_mode == "random"
        and parts is not None
        and fused_random_invert_available(sub2, chunk_frames)
    )
    # complex (explicit-phase, keep_input-style) decode: 2-chains only
    # (a Magnitude tail means real features, not a complex spectrum)
    complex_available = (
        inversion_mode is None
        and y_is_complex
        and parts is not None
        and mag_t is None
        and fused_complex_invert_available(sub2, chunk_frames)
    )
    # sinebank decode: deterministic carried state -> scan-free closed
    # form (plain XLA, every platform); requires the OLA layout the
    # closed form assumes (ADVICE r3)
    sinebank_available = (
        inversion_mode == "sinebank"
        and parts is not None
        and _sinebank_layout_ok(sub2)
    )
    if backend == "fused" and not (
        pghi_available or pghi_gl_available or random_available
        or complex_available or sinebank_available
    ):
        raise ValueError(
            "backend='fused' requested but no fused invert-session path "
            "covers this call (needs an [OverlapAdd, RealtimeSTFT"
            "(, Magnitude)] chain with inversion_mode 'random', 'pghi', "
            "'pghi_gl' or 'sinebank' — or a complex spectrum with mode "
            "None, 2-chain only — and an OLA-supported layout); use "
            "backend='auto' to fall back to the generic scan"
        )
    if sinebank_available and backend != "generic" and (
        backend == "fused" or _sinebank_fits(sub2, y_shape, chunk_frames)
    ):
        return "sinebank"
    take = backend == "fused" or (
        backend == "auto" and _platform(platform) == "tpu"
    )
    # complex decode has no angle footprint and its own (wider) measured
    # crossover — the synthesis-only kernel amortizes better than the
    # full roundtrip (dispatch_regions "complex_decode"; r4.5)
    if complex_available and take and (
        backend == "fused" or _cap_ok("complex_decode", batch_elems)
    ):
        return "complex"
    if pghi_available or pghi_gl_available or random_available:
        rt = chain.transforms[1]
        n_frames = -(-y_shape[-2] // chunk_frames) * chunk_frames
        fits = _angles_fit(rt, batch_elems, n_frames)
        # same measured batch caps as the roundtrip sessions: the invert
        # kernels share their structure minus the analysis GEMM
        if pghi_available and take and (backend == "fused" or fits):
            return "pghi"
        if pghi_gl_available and take and (
            backend == "fused" or (fits and _cap_ok("pghi_gl", batch_elems))
        ):
            return "pghi_gl"
        if random_available and take and (
            backend == "fused" or (fits and _cap_ok("random", batch_elems))
        ):
            return "random"
    return "generic"


def plan_roundtrip(
    chain: AudioTransform,
    x_shape: Tuple[int, ...],
    chunk_size: int,
    inversion_mode: Optional[str] = None,
    backend: str = "auto",
    platform: Optional[str] = None,
) -> str:
    """The :func:`scan_roundtrip` dispatch decision, as data.

    Returns ``"sinebank"`` / ``"complex"`` / ``"pghi"`` / ``"pghi_gl"``
    / ``"random"`` / ``"generic"`` — see :func:`plan_forward` for the
    contract.
    """
    from .ops.pallas.stream_step import (
        fused_forward_session_available,
        fused_pghi_gl_roundtrip_available,
        fused_pghi_roundtrip_available,
        fused_random_roundtrip_available,
        fused_roundtrip_available,
    )

    if backend not in ("auto", "fused", "generic"):
        raise ValueError(
            "unknown scan_roundtrip backend %r (use 'auto', 'fused' or "
            "'generic')" % backend
        )
    batch_elems = _batch_elems(x_shape[:-1])
    parts = _session_parts(chain)
    sub2, mag_t, _ = parts if parts else (chain, None, 0)
    feature_ok = mag_t is None or fused_forward_session_available(
        sub2, chunk_size
    )
    available = (
        inversion_mode is None
        and parts is not None
        and mag_t is None
        and fused_roundtrip_available(sub2, chunk_size)
    )
    pghi_available = (
        inversion_mode == "pghi"
        and parts is not None
        and feature_ok
        and fused_pghi_roundtrip_available(sub2, chunk_size)
    )
    pghi_gl_available = (
        inversion_mode == "pghi_gl"
        and parts is not None
        and feature_ok
        and fused_pghi_gl_roundtrip_available(sub2, chunk_size)
    )
    random_available = (
        inversion_mode == "random"
        and parts is not None
        and feature_ok
        and fused_random_roundtrip_available(sub2, chunk_size)
    )
    sinebank_available = (
        inversion_mode == "sinebank"
        and parts is not None
        and _sinebank_layout_ok(sub2)
        and chunk_size % chain.transforms[1].hop_length == 0
    )
    if backend == "fused" and not (
        available or pghi_available or pghi_gl_available or random_available
        or sinebank_available
    ):
        raise ValueError(
            "backend='fused' requested but no fused session path covers "
            "this call (needs an [OverlapAdd, RealtimeSTFT(, Magnitude)] "
            "chain with inversion_mode None, 'random', 'sinebank', 'pghi' "
            "or 'pghi_gl' — complex roundtrips 2-chain only — chunk_size "
            "a hop multiple, an OLA-supported hop); use backend='auto' to "
            "fall back to the generic scan"
        )
    if sinebank_available and backend != "generic":
        T_c = chunk_size // chain.transforms[1].hop_length
        mag_shape = x_shape[:-1] + (
            -(-x_shape[-1] // chunk_size) * T_c, 0
        )
        if backend == "fused" or _sinebank_fits(sub2, mag_shape, T_c):
            return "sinebank"
    take = backend == "fused" or (
        backend == "auto" and _platform(platform) == "tpu"
    )
    if pghi_available or pghi_gl_available or random_available:
        rt = chain.transforms[1]
        T_c = chunk_size // rt.hop_length
        n_frames = -(-x_shape[-1] // chunk_size) * T_c
        fits = _angles_fit(rt, batch_elems, n_frames)
        if pghi_available and take and (backend == "fused" or fits):
            return "pghi"
        if pghi_gl_available and take and (
            backend == "fused" or (fits and _cap_ok("pghi_gl", batch_elems))
        ):
            return "pghi_gl"
        if random_available and take and (
            backend == "fused" or (fits and _cap_ok("random", batch_elems))
        ):
            return "random"
    if available and take and (
        backend == "fused" or _cap_ok("complex", batch_elems)
    ):
        return "complex"
    return "generic"


def chunk_signal(x: jnp.ndarray, chunk_size: int) -> jnp.ndarray:
    """Split ``(..., L)`` into leading-axis chunks ``(N, ..., chunk_size)``,
    zero-padding the tail."""
    L = x.shape[-1]
    n = -(-L // chunk_size)
    pad = n * chunk_size - L
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    x = x.reshape(x.shape[:-1] + (n, chunk_size))
    return jnp.moveaxis(x, -2, 0)


def session_frame_times(
    chain: AudioTransform, chunk_size: int, n_chunks: int
) -> jnp.ndarray:
    """Frame-start times (seconds) for a whole chunked session.

    Matches the reference's realtime time threading exactly: feeding chunk
    ``i`` with start time ``i * chunk_size / sr`` through the chain's
    ``forward_with_time`` (reference stft.py:106-117, chain threading
    base.py:156-160) yields per-frame times ``shifts + t_i``; this is that
    sequence for all ``n_chunks`` at once (``tests/test_streaming.py``
    pins the equivalence).  The per-chunk shift pattern is probed from the
    chain itself (one zeros-chunk ``forward_with_time`` on a snapshot, so
    Window/MFCC-style frame layouts are honoured), and times are affine
    in the chunk start by the threading contract.
    """
    # snapshot: eager streaming transforms stash ring state on self in
    # forward(); probing a tree-copy keeps the caller's transform (and
    # any eager state) untouched, incl. under jit tracing
    leaves, treedef = jax.tree_util.tree_flatten(chain)
    snap = jax.tree_util.tree_unflatten(treedef, leaves)
    _, tmap = snap.forward_with_time(
        jnp.zeros((chunk_size,), jnp.float32), jnp.zeros((), jnp.float32)
    )
    tmap = jnp.atleast_1d(tmap)
    starts = jnp.arange(n_chunks, dtype=jnp.float32) * (
        chunk_size / float(snap.sr)
    )
    return (tmap[None, :] + starts[:, None]).reshape(-1)


@partial(jax.jit, static_argnames=(
    "chunk_size", "backend", "mesh", "shard_axis", "with_time"
))
def scan_forward(
    chain: AudioTransform,
    x: jnp.ndarray,
    chunk_size: int,
    state: Any = None,
    backend: str = "auto",
    mesh: Any = None,
    shard_axis: str = "data",
    with_time: bool = False,
) -> Tuple[jnp.ndarray, Any]:
    """Run the chain's streaming forward over chunks of ``x`` in one scan.

    Returns ``(outputs, final_state)`` with outputs concatenated along the
    frame axis (-2).

    ``backend="auto"`` dispatches fresh (``state=None``) sessions of
    recognized ``[OverlapAdd, RealtimeSTFT]`` chains to a whole-session
    fused ENCODE kernel (ops/pallas/stream_step.py) — frame assembly +
    windowed DFT for every chunk in one pallas_call; the forward is
    stateless past the framing ring, so the final state is computed in
    closed form (the ring is the signal's tail).  ``"generic"`` forces the
    chain scan; ``"fused"`` fails loudly when the kernel can't cover the
    call.

    ``with_time=True`` returns ``(outputs, times, final_state)`` where
    ``times (T_total,)`` are the frame-start seconds the reference's
    realtime loop would thread through ``forward_with_time`` feeding
    chunk ``i`` at ``i * chunk_size / sr`` (:func:`session_frame_times`;
    session start at t=0 — add an offset for a resumed stream).
    """
    from .ops.pallas.stream_step import make_fused_forward_session

    if mesh is not None:
        # multi-chip: structural batch partitioning — each device scans
        # its local slice (session kernels included); state/output leaves
        # are batch-leading so the shard rule covers them (the no-
        # all-gather contract, parallel/sharding.py:shard_map_batch);
        # frame times are batch-free and return replicated
        from .parallel.sharding import shard_map_batch

        def inner(v, *st):
            return scan_forward(
                chain, v, chunk_size, st[0] if st else None, backend,
                with_time=with_time,
            )

        args = (x,) if state is None else (x, state)
        return shard_map_batch(inner, mesh, shard_axis)(*args)

    n_sess_chunks = -(-x.shape[-1] // chunk_size)
    times = (
        session_frame_times(chain, chunk_size, n_sess_chunks)
        if with_time
        else None
    )

    def _ret(ys, st):
        return (ys, times, st) if with_time else (ys, st)
    # feature chains ([..., Magnitude]) encode through the same kernel:
    # Magnitude.forward is stateless and frame-local, so applying it
    # whole-session to the kernel's spectrum equals the generic scan.
    # The dispatch decision (incl. the loud backend='fused' rejection and
    # every numeric gate) lives in plan_forward/dispatch_regions.json.
    plan = plan_forward(
        chain, x.shape, chunk_size,
        has_state=state is not None, backend=backend,
    )
    parts = _session_parts(chain)
    sub2, mag_t, _ = parts if parts else (chain, None, 0)
    if plan == "fused":
        spec, st2 = make_fused_forward_session(sub2, chunk_size)(x)
        if mag_t is None:
            return _ret(spec, st2)
        feats = mag_t.forward(spec)
        full_state = chain.init_state(x.shape[:-1])
        full_state[0] = st2[0]  # only the framing ring moved
        return _ret(feats, full_state)

    chunks = chunk_signal(x, chunk_size)
    if state is None:
        state = chain.init_state(x.shape[:-1])

    def body(st, chunk):
        st, y = chain.step(st, chunk)
        return st, y

    state, ys = jax.lax.scan(body, state, chunks)
    # ys: (N, ..., T_chunk, F...) -> concat chunks along the frame axis
    ys = jnp.moveaxis(ys, 0, -3) if ys.ndim >= 3 else ys
    ys = ys.reshape(ys.shape[:-3] + (ys.shape[-3] * ys.shape[-2],) + ys.shape[-1:])
    return _ret(ys, state)


@partial(jax.jit, static_argnames=(
    "chunk_frames", "inversion_mode", "backend", "mesh", "shard_axis"
))
def scan_invert(
    chain: AudioTransform,
    y: jnp.ndarray,
    chunk_frames: int,
    inversion_mode: Optional[str] = None,
    key: Optional[jax.Array] = None,
    backend: str = "auto",
    mesh: Any = None,
    shard_axis: str = "data",
) -> jnp.ndarray:
    """Streaming DECODE: spectra/magnitudes ``(..., T, F)`` -> audio.

    The vocoder serving hot path — a model produces frames, the chain
    inverts them chunk by chunk with carried streaming state (RT-PGHI
    history, OLA tail).  This is the invert half of :func:`scan_roundtrip`
    as its own one-scan program: ``chunk_frames`` frames per step through
    ``chain.step_invert`` (the reference's per-chunk
    ``RealtimeSTFT.invert -> OverlapAdd.invert`` loop, reference
    stft.py:324-352, without the analysis half).  ``y`` is real magnitudes
    for phaseless ``inversion_mode``s ("random"/"pghi"/"pghi_gl"/
    "sinebank"), complex spectra for ``None``.  Returns ``(..., T * R)``
    samples where ``R`` is the chain's invert ratio (``hop`` for
    ``[OverlapAdd, RealtimeSTFT]`` chains); the tail chunk is zero-frame
    padded and the output trimmed back to ``T * R``.

    ``backend="auto"`` dispatches recognized ``[OverlapAdd, RealtimeSTFT]``
    phaseless sessions to whole-session fused invert kernels
    (ops/pallas/stream_step.py) — the decode twins of the roundtrip
    session kernels, minus the analysis GEMM; same key pipeline, so draws
    match the generic scan bit-exactly.  Feature chains ``[OverlapAdd,
    RealtimeSTFT, Magnitude]`` decode through the same kernels (``y`` is
    then the Magnitude features, e.g. normalized log-mel): the stateless
    frame-local ``Magnitude.invert`` runs whole-session in XLA first,
    exactly equal to the generic per-chunk application.  ``"sinebank"``
    sessions take a scan-free CLOSED FORM instead (the carried oscillator
    state is deterministic — :func:`_sinebank_session`), on every platform.
    """
    from .ops.pallas.stream_step import (
        make_fused_complex_invert,
        make_fused_pghi_gl_invert,
        make_fused_pghi_invert,
        make_fused_random_invert,
    )

    if mesh is not None:
        # multi-chip decode: per-device session kernels on local slices;
        # the key is folded with the shard index so shards draw
        # independent phases (quality-equivalent, not bit-equal to the
        # single-device run — PARITY.md multi-chip contract)
        from .parallel.sharding import shard_map_batch

        if getattr(y, "ndim", 0) < 3:
            # shard_map_batch's generic rank-2 guard would let an
            # UNBATCHED (T, F) spectrogram through and shard its frame
            # axis as batch — decode needs explicit (B, T, F)
            raise ValueError(
                "scan_invert(mesh=): spectra must carry an explicit "
                "leading batch axis (B, T, F); got shape %r.  Add a "
                "batch dim (y[None]) or drop mesh=."
                % (tuple(getattr(y, "shape", ())),)
            )

        def inner(v, k):
            return scan_invert(
                chain, v, chunk_frames, inversion_mode, k, backend
            )

        if key is None:
            key = jax.random.PRNGKey(0)
        return shard_map_batch(inner, mesh, shard_axis, keyed=True)(y, key)
    # 3-chain feature sessions ([..., Magnitude]) decode through the same
    # kernels: Magnitude.invert is stateless and frame-local, so running
    # it whole-session in XLA before the kernel equals the generic scan's
    # per-chunk application exactly.  The dispatch decision (incl. the
    # loud backend='fused' rejection and every numeric gate) lives in
    # plan_invert/dispatch_regions.json.
    plan = plan_invert(
        chain, y.shape, chunk_frames, inversion_mode,
        y_is_complex=jnp.iscomplexobj(y), backend=backend,
    )
    parts = _session_parts(chain)
    sub2, mag_t, pre = parts if parts else (chain, None, 0)
    if plan == "sinebank":
        ym = mag_t.invert(y) if mag_t is not None else y
        return _sinebank_session(sub2, ym, chunk_frames)
    if plan == "complex":
        return make_fused_complex_invert(sub2, chunk_frames)(y)
    if plan in ("pghi", "pghi_gl", "random"):
        maker = {
            "pghi": make_fused_pghi_invert,
            "pghi_gl": make_fused_pghi_gl_invert,
            "random": make_fused_random_invert,
        }[plan]
        ym = mag_t.invert(y) if mag_t is not None else y
        return maker(sub2, chunk_frames, key=key, pre_splits=pre)(ym)

    T = y.shape[-2]
    n = -(-T // chunk_frames)
    pad = n * chunk_frames - T
    if pad:
        y = jnp.pad(
            y, [(0, 0)] * (y.ndim - 2) + [(0, pad), (0, 0)]
        )
    chunks = y.reshape(
        y.shape[:-2] + (n, chunk_frames, y.shape[-1])
    )
    chunks = jnp.moveaxis(chunks, -3, 0)
    state = chain.init_state(y.shape[:-2], mode=inversion_mode)
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, n)

    def body(st, inp):
        chunk, k = inp
        st, rec = chain.step_invert(
            st, chunk, inversion_mode=inversion_mode, key=k
        )
        return st, rec

    _, recs = jax.lax.scan(body, state, (chunks, keys))
    recs = jnp.moveaxis(recs, 0, -2)
    out = recs.reshape(recs.shape[:-2] + (recs.shape[-2] * recs.shape[-1],))
    ratio = out.shape[-1] // (n * chunk_frames)
    return out[..., : T * ratio]


@partial(jax.jit, static_argnames=(
    "chunk_size", "inversion_mode", "backend", "mesh", "shard_axis"
))
def scan_roundtrip(
    chain: AudioTransform,
    x: jnp.ndarray,
    chunk_size: int,
    inversion_mode: Optional[str] = None,
    key: Optional[jax.Array] = None,
    backend: str = "auto",
    mesh: Any = None,
    shard_axis: str = "data",
) -> jnp.ndarray:
    """Full streaming round-trip (forward then invert per chunk) in one scan.

    The canonical realtime loop (reference stft.py:324-352) as a single
    compiled program; returns the resynthesized signal ``(..., L_out)``.

    With ``inversion_mode`` set, the roundtrip is *phaseless*: the spectrum's
    magnitude is taken before inversion (the reference loop's
    ``invert(spec.abs(), mode)``); ``None`` keeps the complex spectrum
    (direct inversion).

    ``backend="auto"`` dispatches recognized ``[OverlapAdd, RealtimeSTFT]``
    sessions to whole-session fused kernels (ops/pallas/stream_step.py) —
    one pallas_call instead of ~20 tiny XLA ops per chunk, identical math:
    direct (complex) roundtrips, ``"random"`` (the reference's default
    realtime mode), ``"pghi"`` and ``"pghi_gl"`` each ride their own
    kernel inside its measured win region; ``"generic"`` forces the plain
    chain scan.
    """
    from .ops.pallas.stream_step import (
        make_fused_pghi_gl_roundtrip,
        make_fused_pghi_roundtrip,
        make_fused_random_roundtrip,
        make_fused_roundtrip,
    )

    if mesh is not None:
        # multi-chip roundtrip: see scan_invert's mesh leg (same key-fold
        # contract for the phaseless modes)
        from .parallel.sharding import shard_map_batch

        def inner(v, k):
            return scan_roundtrip(
                chain, v, chunk_size, inversion_mode, k, backend
            )

        if key is None:
            key = jax.random.PRNGKey(0)
        return shard_map_batch(inner, mesh, shard_axis, keyed=True)(x, key)
    # 3-chain feature sessions ([..., Magnitude]) compose the ENCODE
    # kernel + whole-session Magnitude forward/invert (stateless,
    # frame-local — equal to the generic per-chunk application) + the
    # DECODE kernel; 2-chains keep their fully-fused roundtrip kernels.
    # The dispatch decision — availability (can the kernel run? explicit
    # "fused" may run at ANY batch), the auto perf caps (measured batch
    # crossovers / the HBM angle-buffer footprint), the loud
    # backend='fused' rejection — lives in plan_roundtrip, with every
    # numeric gate in dispatch_regions.json; the prose justification for
    # each cap is in BENCH_NOTES.md (r3.20-22b sweeps).
    plan = plan_roundtrip(
        chain, x.shape, chunk_size, inversion_mode, backend=backend
    )
    parts = _session_parts(chain)
    sub2, mag_t, pre = parts if parts else (chain, None, 0)
    if plan == "sinebank":
        spec, _ = scan_forward(sub2, x, chunk_size)
        mags = (
            mag_t.invert(mag_t.forward(spec))
            if mag_t is not None
            else jnp.abs(spec)
        )
        return _sinebank_session(
            sub2, mags, chunk_size // chain.transforms[1].hop_length
        )
    if plan in ("pghi", "pghi_gl", "random"):
        from .ops.pallas.stream_step import (
            make_fused_forward_session,
            make_fused_pghi_gl_invert,
            make_fused_pghi_invert,
            make_fused_random_invert,
        )

        rt = chain.transforms[1]
        T_c = chunk_size // rt.hop_length
        if mag_t is not None:
            # encode kernel -> Magnitude forward/invert (whole-session,
            # XLA) -> decode kernel; == the generic 3-chain roundtrip
            # under the session kernels' parity contract
            invert_maker = {
                "pghi": make_fused_pghi_invert,
                "pghi_gl": make_fused_pghi_gl_invert,
                "random": make_fused_random_invert,
            }[plan]
            spec, _ = make_fused_forward_session(sub2, chunk_size)(x)
            mags = mag_t.invert(mag_t.forward(spec))
            return invert_maker(sub2, T_c, key=key, pre_splits=pre)(mags)
        roundtrip_maker = {
            "pghi": make_fused_pghi_roundtrip,
            "pghi_gl": make_fused_pghi_gl_roundtrip,
            "random": make_fused_random_roundtrip,
        }[plan]
        return roundtrip_maker(chain, chunk_size, key=key)(x)
    if plan == "complex":
        return make_fused_roundtrip(chain, chunk_size)(x)

    chunks = chunk_signal(x, chunk_size)
    # states are mode-minimal: thread the session's inversion mode so each
    # stateful child allocates exactly the carry this mode needs
    state = chain.init_state(x.shape[:-1], mode=inversion_mode)
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, chunks.shape[0])

    def body(st, inp):
        chunk, k = inp
        st, y = chain.step(st, chunk)
        if inversion_mode is not None and jnp.iscomplexobj(y):
            y = jnp.abs(y)  # phaseless roundtrip (reference test loop)
        st, rec = chain.step_invert(
            st, y, inversion_mode=inversion_mode, key=k
        )
        return st, rec

    _, recs = jax.lax.scan(body, state, (chunks, keys))
    # recs: (N, ..., chunk) -> (..., N * chunk)
    recs = jnp.moveaxis(recs, 0, -2)
    return recs.reshape(recs.shape[:-2] + (recs.shape[-2] * recs.shape[-1],))
