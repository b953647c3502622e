"""DGT + PGHI tests: window identities, direct-inversion exactness, and
phase-reconstruction quality for the PGHI formulations
(peak-anchored scan / exact heap oracle / native C++)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acids_transforms_tpu import transforms as T
from acids_transforms_tpu.ops.pghi import (
    pghi_heap_numpy,
    pghi_scan,
    phase_gradients,
)
from acids_transforms_tpu.ops.windows import dgt_gamma
from tests.conftest import snr_db


def spectral_convergence(dgt: T.DGT, target_mag: jnp.ndarray, rec: np.ndarray) -> float:
    """|| |STFT(rec)| - target || / ||target|| over the common frames."""
    mag_rec = jnp.abs(dgt.forward(jnp.asarray(rec)))
    n = min(mag_rec.shape[-2], target_mag.shape[-2])
    diff = mag_rec[..., :n, :] - target_mag[..., :n, :]
    return float(jnp.linalg.norm(diff) / jnp.linalg.norm(target_mag[..., :n, :]))


@pytest.fixture(scope="module")
def harmonic():
    sr = 44100
    t = np.arange(2 * 16384) / sr
    x = sum(np.sin(2 * np.pi * f * t + 0.1 * i) / (i + 1) for i, f in enumerate([220, 440, 880, 1320]))
    return (0.5 * x / np.abs(x).max()).astype(np.float32)


def test_dgt_direct_inversion_exact(harmonic):
    t = T.DGT(n_fft=1024, hop_length=256)
    spec = t.forward(jnp.asarray(harmonic))
    rec = np.asarray(t.invert(spec))
    assert snr_db(harmonic, rec) > 60


def test_dgt_batched_forward(test_files):
    sig, _ = test_files
    t = T.DGT(n_fft=1024, hop_length=256)
    spec = t.forward(jnp.asarray(sig))
    assert spec.shape[:2] == sig.shape[:2]
    rec = np.asarray(t.invert(spec))
    assert snr_db(sig, rec) > 60


def test_pghi_reconstruction_quality(harmonic):
    """Peak-anchored scan PGHI must reconstruct a harmonic signal's
    spectrogram closely — comparable to the exact heap, far above random."""
    t = T.DGT(n_fft=1024, hop_length=256)
    mag = jnp.abs(t.forward(jnp.asarray(harmonic)))
    rec = np.asarray(t.invert(mag, inversion_mode="pghi"))
    sc = spectral_convergence(t, mag, rec)
    rec_rand = np.asarray(t.invert(mag, inversion_mode="random"))
    sc_rand = spectral_convergence(t, mag, rec_rand)
    assert sc < 0.15, f"pghi spectral convergence {sc}"
    assert sc < sc_rand / 2, (sc, sc_rand)


def test_pghi_heap_oracle_quality(harmonic):
    t = T.DGT(n_fft=1024, hop_length=256)
    mag = np.asarray(jnp.abs(t.forward(jnp.asarray(harmonic))))
    phase = pghi_heap_numpy(mag, t.gamma, t.n_fft, t.hop_length, 1e-2)
    rec = np.asarray(t.invert(jnp.asarray(mag * np.exp(1j * phase))))
    sc = spectral_convergence(t, jnp.asarray(mag), rec)
    assert sc < 0.15, f"heap pghi spectral convergence {sc}"


def test_pghi_native_matches_numpy_oracle(harmonic):
    from acids_transforms_tpu.native import pghi_native

    if not pghi_native.available():
        pytest.skip("native library not built")
    t = T.DGT(n_fft=512, hop_length=128)
    mag = np.asarray(jnp.abs(t.forward(jnp.asarray(harmonic[:16384]))))
    p_np = pghi_heap_numpy(mag, t.gamma, t.n_fft, t.hop_length, 1e-2)
    p_cc = pghi_native.pghi(mag, t.gamma, t.n_fft, t.hop_length, 1e-2)
    # same algorithm, same order -> near-identical phases on audible cells
    mask = mag > 1e-2 * mag.max()
    assert np.abs(p_np - p_cc)[mask].max() < 1e-3


def test_pghi_exact_mode_via_callback(harmonic):
    t = T.DGT(n_fft=1024, hop_length=256)
    mag = jnp.abs(t.forward(jnp.asarray(harmonic)))
    rec = np.asarray(t.invert(mag, inversion_mode="pghi_exact"))
    sc = spectral_convergence(t, mag, rec)
    assert sc < 0.15, sc


def test_pghi_scan_streaming_stencil_quality(harmonic):
    """The causal (backward-stencil) variant used for streaming must stay
    close to the offline quality."""
    t = T.DGT(n_fft=1024, hop_length=256)
    mag = jnp.abs(t.forward(jnp.asarray(harmonic)))
    phase = pghi_scan(mag, t.gamma, t.n_fft, t.hop_length, 1e-2, time_stencil="backward")
    rec = np.asarray(t.invert(mag * jnp.exp(1j * phase)))
    sc = spectral_convergence(t, mag, rec)
    assert sc < 0.2, sc


def test_pghi_batched_jits(test_files):
    sig, _ = test_files
    t = T.DGT(n_fft=512, hop_length=128)
    mag = jnp.abs(t.forward(jnp.asarray(sig)))  # (3, 2, T, F)
    fn = jax.jit(lambda m: pghi_scan(m, t.gamma, t.n_fft, t.hop_length, 1e-2))
    phase = fn(mag)
    assert phase.shape == mag.shape
    assert np.isfinite(np.asarray(phase)).all()


def test_phase_gradients_shapes_and_linear_term():
    mag = jnp.ones((8, 17))
    ts, fs = phase_gradients(mag, dgt_gamma(32), 32, 8)
    assert ts.shape == mag.shape and fs.shape == mag.shape
    # constant magnitude -> time step is exactly the per-bin rotation
    k = np.arange(17)
    np.testing.assert_allclose(np.asarray(ts[0]), 2 * np.pi * 8 / 32 * k, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fs), np.pi, atol=1e-5)


def test_dgt_griffinlim_and_sinebank_run(harmonic):
    t = T.DGT(n_fft=1024, hop_length=256)
    mag = jnp.abs(t.forward(jnp.asarray(harmonic[:16384])))
    for mode in ("griffin_lim", "sinebank", "random", "keep_input"):
        rec = np.asarray(t.invert(mag, inversion_mode=mode))
        assert np.isfinite(rec).all(), mode


def test_realtime_dgt_streaming_pghi(harmonic):
    """Chunked streaming DGT+PGHI must track the offline causal scan."""
    t = T.DGT(n_fft=1024, hop_length=256)
    rt = t.realtime()
    assert isinstance(rt, T.RealtimeDGT)
    mag = jnp.abs(t.forward(jnp.asarray(harmonic)))  # (T, F)

    state = rt.init_state(())
    outs = []
    chunk = 16
    for i in range(0, mag.shape[-2] - chunk + 1, chunk):
        state, y = rt.invert_stream(state, mag[i: i + chunk, :], inversion_mode="pghi")
        outs.append(np.asarray(y))
    frames = np.concatenate(outs, axis=-2)
    assert frames.shape[-1] == 1024
    assert np.isfinite(frames).all()


def test_realtime_dgt_eager_buffers(harmonic):
    rt = T.RealtimeDGT(n_fft=512, hop_length=128)
    mag = jnp.abs(T.DGT(n_fft=512, hop_length=128).forward(jnp.asarray(harmonic[:8192])))
    y1 = rt.invert(mag[:8], inversion_mode="pghi")
    y2 = rt.invert(mag[8:16], inversion_mode="pghi")
    assert np.isfinite(np.asarray(y1)).all() and np.isfinite(np.asarray(y2)).all()
    assert rt._state is not None
    assert rt._state["mag_buffer"].shape == (2, 257)


def test_realtime_dgt_complex_roundtrip(harmonic):
    """Frame-wise forward/invert with the dual window is exact up to OLA."""
    from acids_transforms_tpu.ops.framing import frame, overlap_add

    n_fft, hop = 1024, 256
    rt = T.RealtimeDGT(n_fft=n_fft, hop_length=hop)
    x = harmonic[: 32 * hop + n_fft]
    frames = frame(jnp.asarray(x), n_fft, hop, -1)
    spec = rt.forward(frames)
    y_frames = rt.invert(spec)
    y = np.asarray(overlap_add(y_frames, hop)) / (n_fft // hop)
    # interior exactness (edges lack full overlap)
    inner = slice(n_fft, len(x) - n_fft)
    assert snr_db(x[inner], y[inner]) > 60


def test_pghi_gl_hybrid_beats_both(harmonic):
    """PGHI-seeded Griffin-Lim must beat both PGHI alone and cold GL."""
    t = T.DGT(n_fft=1024, hop_length=256)
    mag = jnp.abs(t.forward(jnp.asarray(harmonic)))
    sc = {}
    for mode in ("pghi", "griffin_lim", "pghi_gl"):
        rec = np.asarray(t.invert(mag, inversion_mode=mode))
        sc[mode] = spectral_convergence(t, mag, rec)
    assert sc["pghi_gl"] < sc["pghi"], sc
    assert sc["pghi_gl"] < sc["griffin_lim"], sc
    assert sc["pghi_gl"] < 0.05, sc


def test_stft_pghi_with_hann_gamma(harmonic):
    """PGHI on a plain hann STFT via the published effective gamma — the
    hybrid must clearly beat cold Griffin-Lim (capability beyond the
    reference, which restricts PGHI to the Gaussian DGT)."""
    t = T.STFT(n_fft=1024, hop_length=256)
    mag = jnp.abs(t.forward(jnp.asarray(harmonic)))

    def sc(rec):
        mr = jnp.abs(t.forward(jnp.asarray(rec)))
        n = min(mr.shape[-2], mag.shape[-2])
        return float(jnp.linalg.norm(mr[..., :n, :] - mag[..., :n, :]) / jnp.linalg.norm(mag[..., :n, :]))

    sc_pghi = sc(np.asarray(t.invert(mag, inversion_mode="pghi")))
    sc_gl = sc(np.asarray(t.invert(mag, inversion_mode="griffin_lim")))
    sc_hybrid = sc(np.asarray(t.invert(mag, inversion_mode="pghi_gl")))
    assert sc_pghi < 0.3, sc_pghi
    assert sc_hybrid < sc_gl, (sc_hybrid, sc_gl)
    assert sc_hybrid < 0.06, sc_hybrid


@pytest.mark.parametrize("window", ["hann", "hamming", "blackman", "kaiser", "bartlett"])
def test_pghi_all_windows(harmonic, window):
    """Every _WINDOW_GAMMA_C entry is exercised end to end: causal-scan PGHI
    through each supported analysis window reconstructs below a per-window
    spectral-convergence gate (kaiser/bartlett constants are derived, not
    published — tools/derive_gammas.py)."""
    t = T.STFT(n_fft=1024, hop_length=256, window=window)
    mag = jnp.abs(t.forward(jnp.asarray(harmonic)))
    rec = np.asarray(t.invert(mag, inversion_mode="pghi"))

    mr = jnp.abs(t.forward(jnp.asarray(rec)))
    n = min(mr.shape[-2], mag.shape[-2])
    sc = float(
        jnp.linalg.norm(mr[..., :n, :] - mag[..., :n, :])
        / jnp.linalg.norm(mag[..., :n, :])
    )
    assert sc < 0.25, (window, sc)
