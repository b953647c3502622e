"""Exhaustive STFT/ISTFT parity matrix against torch-CPU across windows,
sizes, hop ratios and both spectral backends."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from acids_transforms_tpu.ops.fft import istft, stft
from acids_transforms_tpu.ops.windows import get_window

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("window", ["hann", "hamming", "blackman"])
@pytest.mark.parametrize(
    "n_fft,hop",
    [
        (256, 64), (512, 256), (2048, 512),
        # speech-style shapes: hop not dividing n_fft, n_fft not a power
        # of two — the generic GEMM-DFT path must stay torch-exact there
        (400, 160), (1000, 300),
    ],
)
def test_stft_istft_parity(window, n_fft, hop):
    x = RNG.standard_normal((2, 16384)).astype(np.float32)
    w = get_window(window, n_fft)
    wt = getattr(torch, f"{window}_window")(n_fft)

    spec = stft(jnp.asarray(x), n_fft, hop, w)
    ref = (
        torch.stft(
            torch.from_numpy(x), n_fft, hop, window=wt,
            return_complex=True, onesided=True,
        )
        .transpose(-2, -1)
        .numpy()
    )
    assert np.abs(np.asarray(spec) - ref).max() / np.abs(ref).max() < 1e-4

    y = istft(spec, n_fft, hop, w)
    y_ref = torch.istft(
        torch.from_numpy(ref).transpose(-2, -1), n_fft, hop, window=wt, onesided=True
    ).numpy()
    assert y.shape == y_ref.shape
    assert np.abs(np.asarray(y) - y_ref).max() / np.abs(y_ref).max() < 1e-4


def test_istft_with_length_arg():
    n_fft, hop = 512, 128
    x = RNG.standard_normal(8192).astype(np.float32)
    w = get_window("hann", n_fft)
    spec = stft(jnp.asarray(x), n_fft, hop, w)
    y = istft(spec, n_fft, hop, w, length=8192)
    assert y.shape == (8192,)
    wt = torch.hann_window(n_fft)
    ref = torch.istft(
        torch.from_numpy(np.asarray(spec)).transpose(-2, -1),
        n_fft, hop, window=wt, onesided=True, length=8192,
    ).numpy()
    assert np.abs(np.asarray(y) - ref).max() < 1e-4


def test_stft_center_false():
    n_fft, hop = 512, 128
    x = RNG.standard_normal(8192).astype(np.float32)
    w = get_window("hann", n_fft)
    spec = stft(jnp.asarray(x), n_fft, hop, w, center=False)
    ref = (
        torch.stft(
            torch.from_numpy(x), n_fft, hop, window=torch.hann_window(n_fft),
            center=False, return_complex=True, onesided=True,
        )
        .transpose(-2, -1)
        .numpy()
    )
    n = min(spec.shape[-2], ref.shape[-2])
    assert np.abs(np.asarray(spec)[:n] - ref[:n]).max() / np.abs(ref).max() < 1e-4
