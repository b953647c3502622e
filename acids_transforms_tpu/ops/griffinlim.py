"""Griffin-Lim phase reconstruction with momentum (fast Griffin-Lim).

Matches the torchaudio algorithm invoked by the reference
(transforms/stft.py:174-178: 30 iterations, momentum 0.99, ``rand_init=True``,
``win_length = n_fft``): alternate ISTFT/STFT projections of the target
magnitude, with the momentum extrapolation of Perraudin et al.

The whole loop runs on device under ``lax.fori_loop`` — each iteration is one
ISTFT + one STFT (GEMM/FFT pairs on the MXU), no host round-trips.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .fft import istft, stft
from .phase import expi

__all__ = ["griffin_lim"]

# chained GL iterations per fused-kernel invocation (ops/pallas/glstep.py:
# make_gl_momentum_step(iters=)): amortizes per-iteration HBM state traffic
# and dispatch; interior rows are bit-exact vs single steps at any chain
# length.  Swept on the v5e at 24-iter GL 1024/256 b8 (BENCH_NOTES r3.9):
# 1 -> 498K, 2 -> 598K, 3 -> 614K, 4 -> 650K, 6 -> 596K frames/s — the
# halo re-fetch overtakes the invocation saving past 4.
GL_CHAIN = 4


def griffin_lim(
    magnitude: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    n_iter: int = 30,
    momentum: float = 0.99,
    length: Optional[int] = None,
    rand_init: bool = True,
    key: Optional[jax.Array] = None,
    impl: str = "auto",
    init_phase: Optional[jnp.ndarray] = None,
    taps=None,
    fused: Optional[bool] = None,
) -> jnp.ndarray:
    """Reconstruct a waveform from a magnitude spectrogram ``(..., T, F)``.

    ``init_phase`` seeds the iteration with an explicit phase estimate
    (e.g. PGHI) instead of random/ones — the standard PGHI+GL hybrid, which
    converges far faster than a cold start.  ``taps`` (static cosine-sum
    window coefficients) enable the fused consistency-projection kernel
    (ops/pallas/glstep.py) on TPU, which runs each iteration's whole
    ISTFT→OLA→STFT roundtrip in VMEM with the chunk factorization both
    ways.  In the non-kernel fallback loop taps are forwarded to
    stft/istft but only used when ``impl="factored"`` is requested
    explicitly (as an XLA graph the factorization is HBM-bound and slower
    than the direct GEMM — BENCH_NOTES.md)."""
    mom = momentum / (1.0 + momentum)
    if init_phase is not None:
        angles = expi(init_phase.astype(jnp.float32))
    elif rand_init:
        if key is None:
            key = jax.random.PRNGKey(0)
        kr, ki = jax.random.split(key)
        angles = jax.lax.complex(
            jax.random.normal(kr, magnitude.shape),
            jax.random.normal(ki, magnitude.shape),
        )
    else:
        angles = jnp.ones(magnitude.shape, dtype=jnp.complex64)
    angles = angles / jnp.maximum(jnp.abs(angles), jnp.finfo(jnp.float32).tiny)

    # fused consistency projection (ops/pallas/glstep.py): the whole
    # ISTFT -> OLA -> STFT roundtrip of each iteration runs in one kernel
    # with the chunk factorization both ways — measured 1.6x on TPU at the
    # 1024/256 shape.  Edge frames use the OLA-tail boundary (module docs);
    # quality (spectral convergence) is equivalent, enforced by tests.
    from .pallas.glstep import (
        gl_fullk_available,
        gl_project_available,
    )

    want = jax.default_backend() == "tpu" if fused is None else fused
    use_kernel = (
        want
        and taps is not None
        and gl_project_available(n_fft, hop_length, taps)
    )
    # windows without cosine taps (the DGT gaussian/dual) CAN ride a full-K
    # variant of the whole-iteration kernel, but it is explicit-opt-in only
    # (``fused=True``): full-K GEMMs both directions are FLOP-bound and the
    # kernel measured SLOWER than the XLA loop at the headline DGT shape
    # (0.223 vs 0.257 M frames/s, r3) — kept for shapes where the trade-off
    # may flip and as the factored kernel's reference semantics
    use_fullk = (
        fused is True and not use_kernel
        and gl_fullk_available(n_fft, hop_length)
    )
    if use_kernel or use_fullk:
        from .pallas.glstep import (
            make_gl_momentum_step,
            make_gl_momentum_step_fullk,
        )

        batch_shape = magnitude.shape[:-2]
        T, F = magnitude.shape[-2:]
        mag3 = magnitude.reshape((-1, T, F))
        # whole-iteration kernel: projection + momentum + renormalization in
        # one invocation — no per-iteration XLA elementwise passes over the
        # spectrogram (r3, ops/pallas/glstep.py:make_gl_momentum_step)
        if use_kernel:
            # r3.8/r3.9: chained iterations per kernel invocation —
            # interior-exact vs single steps, divides per-iteration HBM
            # traffic + dispatch by the chain length (measured optimum 4
            # at the 1024/256 bench shape; the halo grows with
            # chain*overlap, so cap the fetch overhead at ~tile_t/8)
            overlap = n_fft // hop_length
            step = step2 = None
            chain_k = min(GL_CHAIN, n_iter)
            while chain_k >= 2 and chain_k * (overlap - 1) > 24:
                chain_k -= 1
            if chain_k >= 2:
                step2, to_rows, from_rows = make_gl_momentum_step(
                    mag3, n_fft, hop_length, taps, window, mom,
                    iters=chain_k,
                )
            if chain_k < 2 or n_iter % chain_k:
                # the single-step factory pads its own magnitude/envelope
                # copies — build it only when remainder steps will run
                step, to_rows, from_rows = make_gl_momentum_step(
                    mag3, n_fft, hop_length, taps, window, mom
                )
        else:
            step, to_rows, from_rows = make_gl_momentum_step_fullk(
                mag3, n_fft, hop_length, window, mom
            )
            step2 = None
        are_r = to_rows(jnp.real(angles).reshape((-1, T, F)))
        aim_r = to_rows(jnp.imag(angles).reshape((-1, T, F)))

        z = jnp.zeros_like(are_r)
        carry = (are_r, aim_r, z, z)
        if step2 is not None:
            groups, rem = divmod(n_iter, chain_k)
            carry = jax.lax.fori_loop(
                0, groups, lambda _, c: step2(*c), carry
            )
            for _ in range(rem):
                carry = step(*carry)  # noqa: step built when rem > 0
        else:
            carry = jax.lax.fori_loop(
                0, n_iter, lambda _, c: step(*c), carry
            )
        are_r, aim_r, _, _ = carry
        angles = jax.lax.complex(from_rows(are_r), from_rows(aim_r)).reshape(
            batch_shape + (T, F)
        )
        return istft(
            magnitude * angles, n_fft, hop_length, window, length=length,
            impl=impl, taps=taps,
        )

    def body(_, carry):
        angles, tprev = carry
        inverse = istft(
            magnitude * angles, n_fft, hop_length, window, length=length,
            impl=impl, taps=taps,
        )
        rebuilt = stft(inverse, n_fft, hop_length, window, impl=impl, taps=taps)
        upd = rebuilt - mom * tprev
        upd = upd / jnp.maximum(jnp.abs(upd), 1e-16)
        return upd, rebuilt

    angles, _ = jax.lax.fori_loop(
        0, n_iter, body, (angles, jnp.zeros_like(angles))
    )
    return istft(
        magnitude * angles, n_fft, hop_length, window, length=length,
        impl=impl, taps=taps,
    )
