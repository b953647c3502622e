"""Griffin-Lim parity vs the torchaudio algorithm (VERDICT r2 #5).

The reference's default STFT inversion is ``torchaudio.functional.griffinlim``
(reference stft.py:174-178: ``griffinlim(x.T, window, n_fft, hop, n_fft, 1.0,
30, 0.99, None, True)``).  torchaudio is not in this image, so the oracle below
re-implements the published momentum recurrence (Perraudin et al., as shipped
by torchaudio) in raw torch ops — same init convention, same momentum update
ordering, same normalization — and the tests assert iterate-level agreement of
our XLA loop with it, plus a spectral-convergence parity gate for the fused
projection kernel across frame counts.
"""
import numpy as np
import pytest
import jax.numpy as jnp
import torch

from acids_transforms_tpu.ops.fft import stft, taps_for_window
from acids_transforms_tpu.ops.griffinlim import griffin_lim
from acids_transforms_tpu.ops.windows import get_window


def torch_momentum_griffinlim(
    specgram: torch.Tensor,
    window: torch.Tensor,
    n_fft: int,
    hop_length: int,
    n_iter: int,
    momentum: float,
    rand_init: bool = False,
) -> torch.Tensor:
    """torchaudio's griffinlim recurrence in raw torch ops (the oracle).

    ``specgram`` is freq-major ``(batch, F, T)`` as torchaudio takes it
    (the reference transposes before calling, stft.py:178).  ``power=1``,
    ``win_length=n_fft``, ``length=None`` — the reference's fixed arguments.
    Ordering matters and is preserved exactly: istft -> stft -> subtract
    ``mom * tprev`` -> normalize by ``abs + 1e-16`` -> store ``tprev``.
    """
    mom = momentum / (1 + momentum)
    if rand_init:
        angles = torch.rand(specgram.size(), dtype=torch.complex64)
    else:
        angles = torch.full(specgram.size(), 1, dtype=torch.complex64)
    tprev = torch.tensor(0.0, dtype=specgram.dtype)
    for _ in range(n_iter):
        inverse = torch.istft(
            specgram * angles, n_fft=n_fft, hop_length=hop_length,
            win_length=n_fft, window=window,
        )
        rebuilt = torch.stft(
            inverse, n_fft=n_fft, hop_length=hop_length, win_length=n_fft,
            window=window, center=True, pad_mode="reflect", normalized=False,
            onesided=True, return_complex=True,
        )
        angles = rebuilt
        if momentum:
            angles = angles - tprev.mul_(mom)
        angles = angles.div(angles.abs().add(1e-16))
        tprev = rebuilt
    return torch.istft(
        specgram * angles, n_fft=n_fft, hop_length=hop_length,
        win_length=n_fft, window=window,
    )


def _harmonic(n: int, sr: int = 44100) -> np.ndarray:
    t = np.arange(n) / sr
    x = sum(
        np.sin(2 * np.pi * f * t) / (i + 1)
        for i, f in enumerate([220, 440, 880, 1760])
    )
    return (x / np.abs(x).max()).astype(np.float32)


# GL is CHAOTIC: a 1e-7 relative input perturbation to the pure-torch oracle
# itself diverges to 1.3e-4 after 5 iterations and 1.4e-3 after 30 (measured
# on this exact setup) — f32 backend differences (~1e-7, GEMM-DFT vs FFT)
# necessarily amplify at the same rate.  Iterate-level tolerances below track
# that measured Lyapunov growth; quality-level (spectral convergence)
# agreement is asserted separately for the long run.
_ITER_TOL = {1: 1e-4, 2: 1e-4, 5: 1e-3, 30: 2e-2}


@pytest.mark.parametrize("n_iter", [1, 2, 5, 30])
def test_griffin_lim_matches_torchaudio_recurrence(n_iter):
    n_fft, hop = 512, 128
    w = get_window("hann", n_fft)
    x = _harmonic(12000)
    mag = jnp.abs(stft(jnp.asarray(x)[None], n_fft, hop, w))  # (1, T, F)

    rec_jax = np.asarray(
        griffin_lim(
            mag, n_fft, hop, w, n_iter=n_iter, momentum=0.99,
            rand_init=False, fused=False,
        )
    )
    mag_t = torch.from_numpy(np.asarray(mag)).transpose(-2, -1)  # (1, F, T)
    rec_t = torch_momentum_griffinlim(
        mag_t, torch.from_numpy(np.asarray(w)), n_fft, hop,
        n_iter=n_iter, momentum=0.99,
    ).numpy()

    n = min(rec_jax.shape[-1], rec_t.shape[-1])
    rel = np.abs(rec_jax[..., :n] - rec_t[..., :n]).max() / np.abs(rec_t).max()
    assert rel < _ITER_TOL[n_iter], (n_iter, rel)
    if n_iter == 30:
        # quality-level agreement: both converge to the same spectral
        # convergence even after trajectories decorrelate
        def sc(rec):
            R = np.abs(np.asarray(stft(jnp.asarray(rec), n_fft, hop, w)))
            m = np.asarray(mag)
            k = min(R.shape[-2], m.shape[-2])
            return np.linalg.norm(R[:, :k] - m[:, :k]) / np.linalg.norm(m)

        s_j, s_t = sc(rec_jax), sc(rec_t[..., :n])
        assert abs(s_j - s_t) < 0.01, (s_j, s_t)


def test_griffin_lim_momentum_scaling_matches():
    # different momentum exercises the mom/(1+mom) scaling and the update
    # ordering (a swapped tprev store diverges immediately at iterate 2)
    n_fft, hop = 512, 128
    w = get_window("hann", n_fft)
    x = _harmonic(9000)
    mag = jnp.abs(stft(jnp.asarray(x)[None], n_fft, hop, w))
    for momentum in (0.0, 0.5, 0.9):
        rec_jax = np.asarray(
            griffin_lim(
                mag, n_fft, hop, w, n_iter=4, momentum=momentum,
                rand_init=False, fused=False,
            )
        )
        rec_t = torch_momentum_griffinlim(
            torch.from_numpy(np.asarray(mag)).transpose(-2, -1),
            torch.from_numpy(np.asarray(w)), n_fft, hop,
            n_iter=4, momentum=momentum,
        ).numpy()
        n = min(rec_jax.shape[-1], rec_t.shape[-1])
        rel = np.abs(rec_jax[..., :n] - rec_t[..., :n]).max() / np.abs(rec_t).max()
        # 4 iterations of measured chaotic growth from f32 backend deltas
        # (see _ITER_TOL note); a wrong mom scaling or swapped tprev store
        # diverges to O(1) here
        assert rel < 1e-3, (momentum, rel)


@pytest.mark.parametrize("n_samples", [6000, 14999, 20608])
def test_gl_fused_sc_parity_across_frame_counts(n_samples):
    # the fused projection kernel's edge-frame boundary delta (OLA-tail
    # instead of trim + reflect-repad, ops/pallas/glstep.py) must not cost
    # convergence quality at any frame count / tile-edge alignment
    n_fft, hop = 512, 128
    w = get_window("hann", n_fft)
    taps = taps_for_window(np.asarray(w))
    x = _harmonic(n_samples)
    mag = jnp.abs(stft(jnp.asarray(x)[None], n_fft, hop, w))

    def sc(rec):
        R = jnp.abs(stft(rec, n_fft, hop, w))
        n = min(R.shape[-2], mag.shape[-2])
        return float(
            jnp.linalg.norm(R[:, :n] - mag[:, :n]) / jnp.linalg.norm(mag)
        )

    rec_xla = griffin_lim(mag, n_fft, hop, w, n_iter=6, fused=False)
    rec_ker = griffin_lim(mag, n_fft, hop, w, n_iter=6, taps=taps, fused=True)
    s_x, s_k = sc(rec_xla), sc(rec_ker)
    assert s_k < max(1.15 * s_x, s_x + 0.02), (n_samples, s_k, s_x)


def test_gl_fused_sc_parity_padded_layout():
    """Non-256-multiple n_fft keeps the padded lane layout in the GL kernel
    (the r3.6 nyquist depad gates on `_nyq_depad`); its SC must still track
    the XLA loop."""
    from acids_transforms_tpu.ops.pallas.spectral import _nyq_depad

    n_fft, hop = 384, 128
    assert not _nyq_depad(n_fft, hop)
    w = get_window("hann", n_fft)
    taps = taps_for_window(np.asarray(w))
    x = _harmonic(12000)
    mag = jnp.abs(stft(jnp.asarray(x)[None], n_fft, hop, w))

    def sc(rec):
        R = jnp.abs(stft(rec, n_fft, hop, w))
        n = min(R.shape[-2], mag.shape[-2])
        return float(
            jnp.linalg.norm(R[:, :n] - mag[:, :n]) / jnp.linalg.norm(mag)
        )

    rec_xla = griffin_lim(mag, n_fft, hop, w, n_iter=6, fused=False)
    rec_ker = griffin_lim(mag, n_fft, hop, w, n_iter=6, taps=taps, fused=True)
    s_x, s_k = sc(rec_xla), sc(rec_ker)
    assert s_k < max(1.15 * s_x, s_x + 0.02), (s_k, s_x)


def test_gl_fused_factored_impl_smoke():
    """griffin_lim(fused=True) must forward taps to its final istft — an
    impl='factored' transform raised ValueError there (review finding)."""
    n_fft, hop = 512, 128
    w = get_window("hann", n_fft)
    taps = taps_for_window(np.asarray(w))
    x = _harmonic(6000)
    mag = jnp.abs(stft(jnp.asarray(x)[None], n_fft, hop, w))
    rec = griffin_lim(
        mag, n_fft, hop, w, n_iter=2, taps=taps, fused=True, impl="factored"
    )
    assert np.isfinite(np.asarray(rec)).all()
