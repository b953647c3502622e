"""Randomized parameter/shape fuzzing: every sampled configuration must
forward and (when invertible) round-trip without shape errors or NaNs."""
import numpy as np
import pytest
import jax.numpy as jnp

from acids_transforms_tpu import transforms as T

RNG = np.random.default_rng(1234)

N_CASES = 8


def _cases():
    out = []
    for _ in range(N_CASES):
        n_fft = int(RNG.choice([128, 256, 512, 2048]))
        hop = n_fft // int(RNG.choice([2, 4, 8]))
        batch = tuple(RNG.integers(1, 4, size=int(RNG.integers(0, 3))))
        length = int(RNG.integers(n_fft, 6 * n_fft))
        out.append((n_fft, hop, batch, length))
    return out


@pytest.mark.parametrize("n_fft,hop,batch,length", _cases())
def test_stft_chain_fuzz(n_fft, hop, batch, length):
    x = jnp.asarray(
        RNG.standard_normal(batch + (length,)).astype(np.float32) * 0.5
    )
    stft_t = T.STFT(n_fft=n_fft, hop_length=hop)
    spec = stft_t.forward(x)
    assert spec.shape[:-2] == batch
    assert spec.shape[-1] == n_fft // 2 + 1
    rec = np.asarray(stft_t.invert(spec))
    assert np.isfinite(rec).all()

    mag_t = T.Magnitude(mode="unipolar", mel=False, n_fft=n_fft).fit(spec)
    y = mag_t.forward(spec)
    m = np.asarray(mag_t.invert(y))
    assert np.isfinite(m).all()


@pytest.mark.parametrize("n_fft,hop,batch,length", _cases()[:6])
def test_dgt_pghi_fuzz(n_fft, hop, batch, length):
    x = jnp.asarray(
        RNG.standard_normal(batch + (length,)).astype(np.float32) * 0.5
    )
    dgt = T.DGT(n_fft=n_fft, hop_length=hop)
    mag = jnp.abs(dgt.forward(x))
    rec = np.asarray(dgt.invert(mag, inversion_mode="pghi"))
    assert rec.shape[:-1] == batch
    assert np.isfinite(rec).all()


@pytest.mark.parametrize("n_fft,hop,batch,length", _cases()[:6])
def test_streaming_fuzz(n_fft, hop, batch, length):
    from acids_transforms_tpu.streaming import scan_roundtrip

    chunk = 2 * n_fft
    L = max(chunk * 2, (length // chunk) * chunk)
    x = jnp.asarray(RNG.standard_normal(batch + (L,)).astype(np.float32) * 0.5)
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(n_fft=n_fft, hop_length=hop)
    y = np.asarray(scan_roundtrip(chain, x, chunk))
    assert y.shape[:-1] == batch
    assert np.isfinite(y).all()
