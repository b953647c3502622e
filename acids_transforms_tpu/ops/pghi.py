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


def _nearest_anchor_fill(phase_anchor, anchored, freq_step):
    """Fill unanchored bins by integrating ``freq_step`` from the nearest
    anchored bin below (up-sweep) or above (down-sweep), choosing the nearer.

    Formulated as two *segmented affine scans*: each bin is the map
    ``f_k(x) = phi_k`` (anchored) or ``f_k(x) = x + step_k`` (unanchored), and
    the prefix composition — an associative op on ``(a, b)`` with
    ``f(x) = a x + b`` — yields the integrated phase from the nearest anchor
    directly.  A third carried coefficient counts the distance.  No gathers,
    no index arithmetic: two ``associative_scan`` calls total (this is the
    per-frame hot path of the PGHI scan).
    """
    dt = phase_anchor.dtype
    F = phase_anchor.shape[-1]
    last_axis = phase_anchor.ndim - 1

    # trapezoid step from k-1 to k (up direction); from k+1 to k is -step
    trap = (freq_step[..., 1:] + freq_step[..., :-1]) / 2.0
    step_up = jnp.concatenate([jnp.zeros_like(freq_step[..., :1]), trap], axis=-1)
    step_dn = jnp.concatenate([-trap, jnp.zeros_like(freq_step[..., :1])], axis=-1)

    a = (~anchored).astype(dt)  # 0 resets the recurrence at anchors

    def scan_dir(step, reverse):
        b = jnp.where(anchored, phase_anchor, step)
        db = jnp.where(anchored, 0.0, 1.0)

        def comb(l, r):  # prefix map: apply l (earlier) then r
            a_l, b_l, d_l = l
            a_r, b_r, d_r = r
            return (a_l * a_r, b_l * a_r + b_r, d_l * a_r + d_r)

        ac, bc, dc = jax.lax.associative_scan(
            comb, (a, b, db), axis=last_axis, reverse=reverse
        )
        return bc, dc, ac == 0  # phase, distance, has-anchor

    phi_up, d_up, v_up = scan_dir(step_up, reverse=False)
    phi_dn, d_dn, v_dn = scan_dir(step_dn, reverse=True)

    big = jnp.asarray(10 * F, dt)
    du = jnp.where(v_up, d_up, big)
    dd = jnp.where(v_dn, d_dn, big)
    filled = jnp.where(du <= dd, phi_up, phi_dn)
    any_anchor = jnp.any(anchored, axis=-1, keepdims=True)
    return jnp.where(any_anchor, filled, jnp.zeros_like(filled))


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
) -> jnp.ndarray:
    """Peak-anchored causal PGHI over ``mag (..., T, F)`` (see module docs).

    ``prev_mag (..., 2, F)`` / ``prev_phase (..., F)`` carry streaming state
    across chunk boundaries (reference dgt.py:247-250); omit them for offline
    use.  Fully batched and jittable.

    ``parallel`` selects the time recurrence: the serial ``lax.scan`` or the
    log-depth affine-selection ``associative_scan`` (identical math, see
    :func:`_pghi_parallel`); ``None`` auto-selects by frame count.
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

    if parallel is None:
        # the log-depth recurrence wins once the serial chain dominates;
        # short streaming chunks stay on the cheap serial scan
        parallel = T >= 32
    if parallel:
        return _pghi_parallel(
            mag, time_step, freq_step, rand_phases, abstol,
            prev_phase, prev1, prev_ts,
        )

    def step(carry, inp):
        prev_phi, prev_m, prev_ts = carry
        m, ts, fs, rnd = inp
        anchored, sig = _anchor_mask(m, prev_m, abstol)
        phi_time = prev_phi + (prev_ts + ts) / 2.0
        filled = _nearest_anchor_fill(jnp.where(anchored, phi_time, 0.0), anchored, fs)
        phi = jnp.where(anchored, phi_time, filled)
        phi = jnp.where(sig, phi, rnd)
        return (phi, m, ts), phi

    def to_front(a):
        return jnp.moveaxis(a, -2, 0)

    init = (prev_phase, prev1, prev_ts)
    _, phases = jax.lax.scan(
        step,
        init,
        (to_front(mag), to_front(time_step), to_front(freq_step), to_front(rand_phases)),
    )
    return jnp.moveaxis(phases, 0, -2)


def _anchor_mask(m, prev_m, abstol):
    """Anchor selection for one frame (or a whole (..., T, F) block at once):
    audible freq-ridge cells also audible in the previous frame, plus onset
    seeding at the loudest bin of anchor-less audible frames."""
    sig = m > abstol[..., None, :] if m.ndim > abstol.ndim else m > abstol
    prev_sig = prev_m > (abstol[..., None, :] if m.ndim > abstol.ndim else abstol)
    time_ok = sig & prev_sig
    mpad = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(1, 1)], constant_values=-1.0)
    peak = (m >= mpad[..., :-2]) & (m >= mpad[..., 2:])
    anchored = time_ok & peak
    no_anchor = ~jnp.any(anchored, axis=-1, keepdims=True)
    is_gmax = m == jnp.max(m, axis=-1, keepdims=True)
    return anchored | (no_anchor & sig & is_gmax), sig


def _pghi_parallel(
    mag, time_step, freq_step, rand_phases, abstol, prev_phase, prev1, prev_ts
):
    """Log-depth PGHI time recurrence.

    The serial scan computes ``phi_t = G_t(phi_{t-1})`` where, given the
    anchor pattern (a pure function of magnitudes), ``G_t`` is an
    *affine-selection* map:

        phi_t[k] = g_t[k] * phi_{t-1}[s_t[k]] + d_t[k]

    with ``s_t[k]`` the bin whose time-anchored phase the fill propagates
    from (the nearest anchor; ``k`` itself when anchored), ``d_t[k]`` the
    time-trapezoid at the anchor plus the frequency-trapezoid path integral
    anchor->k, and ``g_t = 0`` for silent bins (random phase enters through
    ``d``).  Such maps are closed under composition —

        (s, d, g) . (s', d', g') = (s[s'], g' * d[s'] + d', g' * g[s'])

    — so the whole time recurrence is one ``associative_scan`` over frames:
    serial depth T collapses to ceil(log2 T) gather+mad stages, with the
    per-frame anchor/fill precomputation batched over all frames in two
    associative scans along frequency (vs 2T in the serial path).  Output is
    numerically identical to the serial scan up to fp reassociation.
    """
    dt = mag.dtype
    T, F = mag.shape[-2], mag.shape[-1]
    batch = mag.shape[:-2]

    prev_m = jnp.concatenate([prev1[..., None, :], mag[..., :-1, :]], axis=-2)
    anchored, sig = _anchor_mask(mag, prev_m, abstol)

    # time trapezoid c_t[k] = (ts[t-1, k] + ts[t, k]) / 2
    ts_prev = jnp.concatenate([prev_ts[..., None, :], time_step[..., :-1, :]], axis=-2)
    c = (ts_prev + time_step) / 2.0

    # --- frequency fill, batched over all frames: nearest anchor index,
    # path integral and distance via segmented affine scans along F
    trap = (freq_step[..., 1:] + freq_step[..., :-1]) / 2.0
    step_up = jnp.concatenate([jnp.zeros_like(freq_step[..., :1]), trap], axis=-1)
    step_dn = jnp.concatenate([-trap, jnp.zeros_like(freq_step[..., :1])], axis=-1)

    a = (~anchored).astype(dt)
    kidx = jnp.broadcast_to(jnp.arange(F, dtype=dt), anchored.shape)
    last_axis = anchored.ndim - 1

    def scan_dir(step, reverse):
        b_idx = jnp.where(anchored, kidx, 0.0)
        b_path = jnp.where(anchored, 0.0, step)
        b_dist = jnp.where(anchored, 0.0, 1.0)

        def comb(l, r):  # prefix map: apply l (earlier) then r
            a_l, i_l, p_l, d_l = l
            a_r, i_r, p_r, d_r = r
            return (
                a_l * a_r,
                i_l * a_r + i_r,
                p_l * a_r + p_r,
                d_l * a_r + d_r,
            )

        ac, ic, pc, dc = jax.lax.associative_scan(
            comb, (a, b_idx, b_path, b_dist), axis=last_axis, reverse=reverse
        )
        return ic, pc, dc, ac == 0  # index, path, distance, has-anchor

    i_up, p_up, d_up, v_up = scan_dir(step_up, reverse=False)
    i_dn, p_dn, d_dn, v_dn = scan_dir(step_dn, reverse=True)

    big = jnp.asarray(10 * F, dt)
    du = jnp.where(v_up, d_up, big)
    dd = jnp.where(v_dn, d_dn, big)
    use_up = du <= dd
    src = jnp.where(use_up, i_up, i_dn).astype(jnp.int32)
    path = jnp.where(use_up, p_up, p_dn)

    # --- assemble per-frame affine-selection elements (s, d, g)
    s = jnp.where(anchored, jnp.arange(F, dtype=jnp.int32), src)
    c_at_s = jnp.take_along_axis(c, s, axis=-1)
    d = jnp.where(anchored, c, c_at_s + path)
    d = jnp.where(sig, d, rand_phases)
    g = sig.astype(dt)
    # silent bins ignore the source phase entirely
    s = jnp.where(sig, s, jnp.arange(F, dtype=jnp.int32))

    # --- seed element: a constant map producing prev_phase
    seed_s = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32), batch + (1, F))
    seed_d = jnp.broadcast_to(prev_phase[..., None, :], batch + (1, F))
    seed_g = jnp.zeros(batch + (1, F), dt)

    s = jnp.concatenate([seed_s, s], axis=-2)
    d = jnp.concatenate([seed_d, d], axis=-2)
    g = jnp.concatenate([seed_g, g], axis=-2)

    # scan over frames: move T to the front so the combine gathers along F
    def to_front(x):
        return jnp.moveaxis(x, -2, 0)

    def comb(l, r):  # l earlier:  f_r(f_l(x))[k] = g_r[k] f_l(x)[s_r[k]] + d_r[k]
        s_l, d_l, g_l = l
        s_r, d_r, g_r = r
        take = lambda arr: jnp.take_along_axis(arr, s_r, axis=-1)
        return (take(s_l), g_r * take(d_l) + d_r, g_r * take(g_l))

    _, dc, _ = jax.lax.associative_scan(
        comb, (to_front(s), to_front(d), to_front(g)), axis=0
    )
    # the seed ignores its input, so every prefix is a constant map = phi_t
    return jnp.moveaxis(dc[1:], 0, -2)


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
