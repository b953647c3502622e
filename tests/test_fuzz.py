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


@pytest.mark.parametrize("n_fft,hop,batch,length", _cases())
def test_factored_impl_fuzz(n_fft, hop, batch, length):
    # impl="factored" must agree with the default GEMM for every sampled
    # shape (cosine-sum windows, hop | n_fft by construction of _cases)
    from acids_transforms_tpu.ops.fft import istft, stft, taps_for_window
    from acids_transforms_tpu.ops.windows import get_window

    name = ["hann", "hamming", "blackman"][int(RNG.integers(0, 3))]
    w = get_window(name, n_fft)
    taps = taps_for_window(np.asarray(w))
    x = jnp.asarray(RNG.standard_normal(batch + (length,)).astype(np.float32))
    ref = stft(x, n_fft, hop, w)
    fac = stft(x, n_fft, hop, w, impl="factored", taps=taps)
    rel = float(jnp.abs(fac - ref).max() / jnp.abs(ref).max())
    assert rel < 1e-4, (name, n_fft, hop, rel)
    rec_ref = np.asarray(istft(ref, n_fft, hop, w))
    rec_fac = np.asarray(istft(ref, n_fft, hop, w, impl="factored", taps=taps))
    scale = np.abs(rec_ref).max() + 1e-9
    assert np.abs(rec_fac - rec_ref).max() / scale < 1e-4, (name, n_fft, hop)


@pytest.mark.parametrize("n_fft,hop,batch,length", _cases()[:5])
def test_fused_dispatch_fuzz(n_fft, hop, batch, length):
    # the pallas fused forward (interpret kernel on CPU) agrees with the
    # chain for sampled shapes inside its constraints
    from acids_transforms_tpu.fuse import fusable, fuse_forward

    x = jnp.asarray(
        RNG.standard_normal(batch + (length,)).astype(np.float32) * 0.5
    )
    chain = (T.STFT(n_fft=n_fft, hop_length=hop) + T.Magnitude(
        mode="unipolar", mel=True, n_fft=n_fft
    )).fit(x)
    assert fusable(chain, "pallas")
    y_f = np.asarray(fuse_forward(chain, "pallas")(x))
    y_r = np.asarray(chain.forward(x))
    assert y_f.shape == y_r.shape
    assert np.abs(y_f - y_r).max() / (np.abs(y_r).max() + 1e-9) < 1e-4


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
