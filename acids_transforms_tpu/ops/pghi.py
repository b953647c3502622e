"""Phase Gradient Heap Integration (PGHI) — TPU-native formulation.

The reference's phaseless DGT inversion (acids_transforms/transforms/dgt.py:
156-236 offline, 338-466 streaming) integrates the phase-gradient field of a
Gaussian-window spectrogram by greedy region growing over a magnitude-ordered
heap — serial, data-dependent control flow that is fundamentally hostile to a
systolic machine.  The TPU formulation here (``pghi_scan``) replaces the heap
with a **peak-anchored causal propagation** that is one ``lax.scan`` over
frames with only dense vector ops per frame:

1. *time anchors*: bins that are local magnitude maxima along frequency and
   audible in both this and the previous frame take the trapezoidal
   time-direction integral from the previous frame's phase — these are
   exactly the high-magnitude ridge cells the heap would pop first, and
   anchoring *only* ridge cells keeps noisy low-magnitude time-steps from
   desynchronizing a blob's skirts;
2. *frequency fill*: every other audible bin integrates the freq-direction
   trapezoid from its nearest anchor, computed with cumulative scans (no
   heap, O(F));
3. *onset seeding*: a frame with no time anchor seeds at its loudest bin
   (the heap's per-region seed, reference dgt.py:173-176);
4. silent bins (below ``tol * max``) get random phase (reference
   dgt.py:402-405).

On the benchmark corpus this matches the exact heap's spectral convergence
(harmonic 0.080 vs 0.088; chirp 0.100 vs 0.083 — see tests/test_dgt.py)
while vectorizing over bins and batch; the reference loops batch entries in
Python (dgt.py:349-353).  A magnitude-weighted least-squares/CG solver was
evaluated and rejected: minimizing gradient-consistency energy *degrades*
reconstruction (global LS spreads the field's inconsistencies into
high-magnitude regions — greedy max-first integration is structurally the
right algorithm, not an approximation).

For offline batches the time recurrence runs **blocked** (``parallel=True``):
each frame is an affine-selection map of the previous frame's phase, maps
compose associatively, and a sqrt-decomposition cuts the serial depth from T
to ``~2 sqrt(T)`` — see :func:`_pghi_blocked`.  Two formulations that look
faster on paper were measured and rejected on the v5e (BENCH_NOTES.md):
a log-depth ``associative_scan`` over the maps (8x SLOWER — each composition
stage is three ``take_along_axis`` gathers, and a single F=513 gather costs
~3 ms on the VPU) and a gather-based boundary pass (same reason).  The rule
that survives: **no gathers on the TPU, ever** — selection is done with
segmented scans (within frames) and one-hot matmuls on the MXU (across block
boundaries).

``pghi_heap_numpy`` keeps the exact magnitude-ordered heap on the host as the
correctness oracle and the ``pghi_exact`` inversion mode (accelerated by
native/pghi.cc when built).

Phase-gradient computation (``phase_gradients``): central (offline) or
3-point backward (causal/streaming, reference dgt.py:394) differences of the
log-magnitude with the Gaussian Cauchy-Riemann factors

    time_step[t, k] = dY/dk / fmul + 2*pi*hop*k/n_fft
    freq_step[t, k] = -fmul * dY/dt + pi,     fmul = gamma / (hop * n_fft)

matching the reference's ``modgabphasegrad`` (dgt.py:222-236) with
``gamma = 2*pi*lambda^2``.  (Naming note: the reference calls the
time-direction step ``fgradw`` and the frequency-direction step ``tgradw``,
and its realtime variant integrates them swapped, dgt.py:437-457 — here the
names say what they integrate and the corrected assignment is used
everywhere.)
"""
from __future__ import annotations

import heapq
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "phase_gradients",
    "pghi_scan",
    "pghi_heap_numpy",
]


def phase_gradients(
    mag: jnp.ndarray,
    gamma: float,
    n_fft: int,
    hop_length: int,
    time_stencil: str = "central",
    eps: float = 1.19e-7,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Phase-gradient fields from a magnitude spectrogram ``(..., T, F)``.

    Returns ``(time_step, freq_step)``: the estimated phase increment per
    frame step (along T) and per bin step (along F).

    ``time_stencil``: ``"central"`` (offline) or ``"backward"`` — the causal
    3-point stencil ``(3 Y[t] - 4 Y[t-1] + Y[t-2]) / 2`` used for streaming
    (reference dgt.py:394, after tifresi).
    """
    fmul = gamma / (hop_length * n_fft)
    Y = jnp.log(jnp.maximum(mag, eps))

    # frequency-direction derivative of log-mag (central, replicate edges)
    Yf = jnp.pad(Y, [(0, 0)] * (Y.ndim - 1) + [(1, 1)], mode="edge")
    dY_dk = (Yf[..., 2:] - Yf[..., :-2]) / 2.0

    # time-direction derivative of log-mag
    if time_stencil == "central":
        Yt = jnp.pad(Y, [(0, 0)] * (Y.ndim - 2) + [(1, 1), (0, 0)], mode="edge")
        dY_dt = (Yt[..., 2:, :] - Yt[..., :-2, :]) / 2.0
    elif time_stencil == "backward":
        Yt = jnp.pad(Y, [(0, 0)] * (Y.ndim - 2) + [(2, 0), (0, 0)], mode="edge")
        dY_dt = (3.0 * Yt[..., 2:, :] - 4.0 * Yt[..., 1:-1, :] + Yt[..., :-2, :]) / 2.0
    else:
        raise ValueError("unknown time stencil %r" % time_stencil)

    k = jnp.arange(mag.shape[-1])
    time_step = dY_dk / fmul + (2.0 * jnp.pi * hop_length / n_fft) * k
    freq_step = -fmul * dY_dt + jnp.pi
    return time_step, freq_step


def _nearest_anchor_fill(values, anchored, freq_step):
    """Fill unanchored bins from the nearest anchored bin below (up-sweep) or
    above (down-sweep), choosing the nearer; the FIRST channel of ``values``
    additionally integrates the ``freq_step`` trapezoid along the way.

    Formulated as two *segmented affine scans*: each bin is the map
    ``f_k(x) = v_k`` (anchored) or ``f_k(x) = x + step_k`` (unanchored), and
    the prefix composition — an associative op on ``(a, b)`` with
    ``f(x) = a x + b`` — yields the propagated value from the nearest anchor
    directly.  One extra carried coefficient counts the distance; additional
    channels (the blocked recurrence's source-index and gate, see
    :func:`_pghi_blocked`) ride the same scan with zero step.  No gathers, no
    index arithmetic: two ``associative_scan`` calls total (this is the
    per-frame hot path of the PGHI scan).
    """
    phase_anchor = values[0]
    dt = phase_anchor.dtype
    F = phase_anchor.shape[-1]
    last_axis = phase_anchor.ndim - 1

    # trapezoid step from k-1 to k (up direction); from k+1 to k is -step
    trap = (freq_step[..., 1:] + freq_step[..., :-1]) / 2.0
    step_up = jnp.concatenate([jnp.zeros_like(freq_step[..., :1]), trap], axis=-1)
    step_dn = jnp.concatenate([-trap, jnp.zeros_like(freq_step[..., :1])], axis=-1)

    a = (~anchored).astype(dt)  # 0 resets the recurrence at anchors

    def scan_dir(step, reverse):
        bs = [jnp.where(anchored, values[0], step)]
        for v in values[1:]:
            bs.append(jnp.where(anchored, v, 0.0))
        bs.append(jnp.where(anchored, 0.0, 1.0))  # distance counter

        def comb(l, r):  # prefix map: apply l (earlier) then r
            a_l, bs_l = l[0], l[1:]
            a_r, bs_r = r[0], r[1:]
            return (a_l * a_r,) + tuple(
                b_l * a_r + b_r for b_l, b_r in zip(bs_l, bs_r)
            )

        out = jax.lax.associative_scan(
            comb, (a,) + tuple(bs), axis=last_axis, reverse=reverse
        )
        ac, filled, dist = out[0], out[1:-1], out[-1]
        return filled, dist, ac == 0  # channels, distance, has-anchor

    f_up, d_up, v_up = scan_dir(step_up, reverse=False)
    f_dn, d_dn, v_dn = scan_dir(step_dn, reverse=True)

    big = jnp.asarray(10 * F, dt)
    du = jnp.where(v_up, d_up, big)
    dd = jnp.where(v_dn, d_dn, big)
    use_up = du <= dd
    any_anchor = jnp.any(anchored, axis=-1, keepdims=True)
    out = []
    for fu, fd in zip(f_up, f_dn):
        filled = jnp.where(use_up, fu, fd)
        out.append(jnp.where(any_anchor, filled, jnp.zeros_like(filled)))
    return tuple(out)


def _anchor_mask(m, prev_m, abstol):
    """Anchor selection for one frame (or a whole (..., T, F) block at once):
    audible freq-ridge cells also audible in the previous frame, plus onset
    seeding at the loudest bin of anchor-less audible frames."""
    thr = abstol[..., None, :] if m.ndim > abstol.ndim else abstol
    sig = m > thr
    prev_sig = prev_m > thr
    time_ok = sig & prev_sig
    mpad = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(1, 1)], constant_values=-1.0)
    peak = (m >= mpad[..., :-2]) & (m >= mpad[..., 2:])
    anchored = time_ok & peak
    no_anchor = ~jnp.any(anchored, axis=-1, keepdims=True)
    is_gmax = m == jnp.max(m, axis=-1, keepdims=True)
    return anchored | (no_anchor & sig & is_gmax), sig


def _pghi_core(
    anchored, sig, c, freq_step, rnd, init_phase, track_map=False
):
    """The PGHI time recurrence: one ``lax.scan`` over the frame axis (-2).

    Inputs are fully precomputed per frame (anchor mask, audibility, time
    trapezoid ``c``, frequency steps, random phases); the carry is just the
    previous frame's phase.  With ``track_map=True`` two extra channels ride
    the same segmented-scan fill — the *source index* ``idx`` (which input
    bin each output phase chains back to) and the *gate* ``g`` (0 once a
    random-phase reset broke the chain) — so the scan simultaneously yields
    the block's composed affine-selection map ``phi_out = g * phi_in[idx] +
    phi`` for the blocked recurrence, at ~no extra cost.
    """
    F = c.shape[-1]
    kidx = jnp.arange(F, dtype=c.dtype)

    def step(carry, inp):
        anch, sg, c_t, fs, rnd_t = inp
        if track_map:
            phi, idx, g = carry
        else:
            phi = carry
        phi_t = phi + c_t  # anchored bins: time trapezoid from prev phase
        if track_map:
            fill_phi, fill_idx, fill_g = _nearest_anchor_fill(
                (jnp.where(anch, phi_t, 0.0), jnp.where(anch, idx, 0.0),
                 jnp.where(anch, g, 0.0)),
                anch, fs,
            )
            idx = jnp.where(anch, idx, fill_idx)
            g = jnp.where(anch, g, fill_g)
            idx = jnp.where(sg, idx, kidx)
            g = jnp.where(sg, g, 0.0)
        else:
            (fill_phi,) = _nearest_anchor_fill(
                (jnp.where(anch, phi_t, 0.0),), anch, fs
            )
        phi = jnp.where(anch, phi_t, fill_phi)
        phi = jnp.where(sg, phi, rnd_t)
        carry = (phi, idx, g) if track_map else phi
        return carry, phi

    def to_front(x):
        return jnp.moveaxis(x, -2, 0)

    init = (
        (init_phase, jnp.broadcast_to(kidx, init_phase.shape),
         jnp.ones_like(init_phase))
        if track_map
        else init_phase
    )
    carry, phases = jax.lax.scan(
        step,
        init,
        (to_front(anchored), to_front(sig), to_front(c),
         to_front(freq_step), to_front(rnd)),
    )
    phases = jnp.moveaxis(phases, 0, -2)
    if track_map:
        return phases, carry
    return phases, None


def _onehot_apply(idx, g, d, phi):
    """Apply the affine-selection map ``g * phi[idx] + d`` WITHOUT a gather:
    build the one-hot selection of ``idx`` and contract it on the MXU.
    ``idx`` is float (exact integers); all shapes ``(..., F)``."""
    F = phi.shape[-1]
    onehot = (idx[..., :, None] == jnp.arange(F, dtype=idx.dtype)).astype(phi.dtype)
    # HIGHEST: default (bf16) would round the selected phases themselves
    sel = jnp.einsum(
        "...kf,...f->...k", onehot, phi, precision=jax.lax.Precision.HIGHEST
    )
    return g * sel + d


def _pghi_blocked(anchored, sig, c, freq_step, rnd, init_phase, block: int):
    """Blocked PGHI time recurrence: serial depth T -> ``block + T/block``.

    Each frame acts on the previous phase as an affine-selection map
    ``phi_t[k] = g_t[k] * phi_{t-1}[s_t[k]] + d_t[k]`` (silent bins gate to
    their random phase; everything else chains back to some bin of the
    previous frame).  The schedule:

    1. run the scan on every length-``block`` slab *in parallel* (slabs ride
       as a batch dim), seeded with phase 0 and ``track_map=True`` — the
       final carry of each slab is its composed map ``(idx, g, d)``;
    2. thread the true boundary phases through the ~T/block composed maps —
       each application is a one-hot matmul on the MXU (gathers measured ~3ms
       each on the v5e; one-hot matvecs are ~100x cheaper here);
    3. every bin's phase is ``g * phi_in[idx] + d`` of its slab's incoming
       phase — one batched one-hot matmul, no re-scan.

    Numerically identical to the serial scan up to fp reassociation.
    """
    T, F = c.shape[-2], c.shape[-1]
    batch = c.shape[:-2]
    n_blocks = -(-T // block)
    pad = n_blocks * block - T

    def pad_t(x, value):
        if not pad:
            return x
        shp = x.shape[:-2] + (pad, F)
        return jnp.concatenate([x, jnp.full(shp, value, x.dtype)], axis=-2)

    # identity padding frames: everything anchored & audible with zero steps
    # (phi, idx, g all pass straight through)
    anchored_p = pad_t(anchored, True)
    sig_p = pad_t(sig, True)
    c_p = pad_t(c, 0.0)
    fs_p = pad_t(freq_step, 0.0)
    rnd_p = pad_t(rnd, 0.0)

    def slab(x):  # (..., n_blocks * block, F) -> (..., n_blocks, block, F)
        return x.reshape(x.shape[:-2] + (n_blocks, block, F))

    zero0 = jnp.zeros(batch + (n_blocks, F), c.dtype)
    # pass 1: all slabs in parallel, seed 0, track the composed map
    d_all, (d_end, idx_end, g_end) = _pghi_core(
        slab(anchored_p), slab(sig_p), slab(c_p), slab(fs_p), slab(rnd_p),
        zero0, track_map=True,
    )

    # pass 2: boundary phases through the composed maps (serial over blocks,
    # one-hot matvec each)
    def boundary(phi, blk):
        idx_b, g_b, d_b = blk
        return _onehot_apply(idx_b, g_b, d_b, phi), phi

    def bfront(x):  # (..., n_blocks, F) -> (n_blocks, ..., F)
        return jnp.moveaxis(x, -2, 0)

    phi0 = init_phase
    _, phi_in = jax.lax.scan(
        boundary, phi0, (bfront(idx_end), bfront(g_end), bfront(d_end))
    )
    phi_in = jnp.moveaxis(phi_in, 0, -2)  # (..., n_blocks, F): slab seeds

    # pass 3: apply every frame's composed-so-far map to its slab seed.
    # d_all is phase-with-seed-0; idx/g per frame aren't stored (only final
    # carries are), so recompute cheaply: phi_t = d_t + g_t * phi_in[idx_t]
    # requires per-frame maps — instead re-run pass 1 with the true seeds.
    phases, _ = _pghi_core(
        slab(anchored_p), slab(sig_p), slab(c_p), slab(fs_p), slab(rnd_p),
        phi_in, track_map=False,
    )
    phases = phases.reshape(batch + (n_blocks * block, F))
    return phases[..., :T, :]


def pghi_scan(
    mag: jnp.ndarray,
    gamma: float,
    n_fft: int,
    hop_length: int,
    tolerance: float = 1e-2,
    prev_mag: Optional[jnp.ndarray] = None,
    prev_phase: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    time_stencil: str = "backward",
    parallel: Optional[bool] = None,
    block: Optional[int] = None,
) -> jnp.ndarray:
    """Peak-anchored causal PGHI over ``mag (..., T, F)`` (see module docs).

    ``prev_mag (..., 2, F)`` / ``prev_phase (..., F)`` carry streaming state
    across chunk boundaries (reference dgt.py:247-250); omit them for offline
    use.  Fully batched and jittable.

    ``parallel`` selects the time recurrence: the serial ``lax.scan`` or the
    sqrt-blocked schedule (identical math, ~2 sqrt(T) serial depth, see
    :func:`_pghi_blocked`); ``None`` auto-selects by frame count.
    """
    batch_shape = mag.shape[:-2]
    T, F = mag.shape[-2], mag.shape[-1]
    if prev_mag is None:
        prev_mag = jnp.zeros(batch_shape + (2, F), mag.dtype)
    if prev_phase is None:
        prev_phase = jnp.zeros(batch_shape + (F,), mag.dtype)
    if key is None:
        key = jax.random.PRNGKey(0)

    mag_ext = jnp.concatenate([prev_mag, mag], axis=-2)
    time_step, freq_step = phase_gradients(
        mag_ext, gamma, n_fft, hop_length, time_stencil=time_stencil
    )
    # the buffered frame's own time step seeds the first trapezoid so chunked
    # streaming is bit-identical to processing the frames in one call
    prev_ts = time_step[..., 1, :]
    time_step = time_step[..., 2:, :]
    freq_step = freq_step[..., 2:, :]

    mx = jnp.max(mag, axis=(-2, -1), keepdims=True)
    abstol = jnp.maximum(tolerance * mx, 1.19e-7)[..., 0, :]  # (..., 1)

    prev1 = prev_mag[..., 1, :]
    rand_phases = 2.0 * jnp.pi * jax.random.uniform(key, mag.shape, dtype=mag.dtype)

    # batched per-frame precomputation (hoisted out of the scan)
    prev_m = jnp.concatenate([prev1[..., None, :], mag[..., :-1, :]], axis=-2)
    anchored, sig = _anchor_mask(mag, prev_m, abstol)
    ts_prev = jnp.concatenate([prev_ts[..., None, :], time_step[..., :-1, :]], axis=-2)
    c = (ts_prev + time_step) / 2.0

    if block is None:
        # steps = 2*block + T/block (passes 1+3 and the boundary pass are all
        # latency-bound per step on TPU) -> optimum at sqrt(T/2)
        block = max(8, min(128, int(np.ceil(np.sqrt(T / 2.0)))))
    if parallel is None:
        parallel = T >= 4 * block
    if parallel:
        return _pghi_blocked(
            anchored, sig, c, freq_step, rand_phases, prev_phase, block
        )
    phases, _ = _pghi_core(
        anchored, sig, c, freq_step, rand_phases, prev_phase, track_map=False
    )
    return phases


# ================================================================ host oracle
def pghi_heap_numpy(
    mag: np.ndarray,
    gamma: float,
    n_fft: int,
    hop_length: int,
    tolerance: float = 1e-2,
) -> np.ndarray:
    """Exact magnitude-ordered heap integration (host / oracle).

    Single spectrogram ``(T, F)``.  Semantics follow the published PGHI
    algorithm (and reference dgt.py:168-220): seed at the global magnitude
    maximum, grow the region in decreasing-magnitude order, integrating the
    trapezoidal phase-gradient targets to 4-neighbours; restart at the next
    maximum until everything below ``tol * max`` remains (phase 0 there).
    """
    mag = np.asarray(mag, dtype=np.float64)
    T, F = mag.shape
    fmul = gamma / (hop_length * n_fft)
    Y = np.log(np.maximum(mag, 1.19e-7))
    Yp = np.pad(Y, 1, mode="edge")
    dY_dk = (Yp[1:-1, 2:] - Yp[1:-1, :-2]) / 2.0
    dY_dt = (Yp[2:, 1:-1] - Yp[:-2, 1:-1]) / 2.0
    time_step = dY_dk / fmul + (2.0 * np.pi * hop_length / n_fft) * np.arange(F)
    freq_step = -fmul * dY_dt + np.pi

    phase = np.zeros((T, F))
    m = mag.copy()
    abstol = 1.19e-7
    thresh = m.max() * tolerance
    m[m < thresh] = abstol

    heap = []
    remaining = m > abstol

    def push_seed():
        if not remaining.any():
            return False
        t, k = np.unravel_index(np.argmax(np.where(remaining, m, -np.inf)), m.shape)
        heapq.heappush(heap, (-m[t, k], int(t), int(k)))
        remaining[t, k] = False
        return True

    if not push_seed():
        return phase.astype(np.float32)

    while True:
        while heap:
            _, t, k = heapq.heappop(heap)
            for dt_, dk_, grad, sign in (
                (1, 0, time_step, +1.0),
                (-1, 0, time_step, -1.0),
                (0, 1, freq_step, +1.0),
                (0, -1, freq_step, -1.0),
            ):
                nt, nk = t + dt_, k + dk_
                if 0 <= nt < T and 0 <= nk < F and remaining[nt, nk]:
                    phase[nt, nk] = phase[t, k] + sign * (grad[t, k] + grad[nt, nk]) / 2.0
                    heapq.heappush(heap, (-m[nt, nk], nt, nk))
                    remaining[nt, nk] = False
        if not push_seed():
            break
    return phase.astype(np.float32)
