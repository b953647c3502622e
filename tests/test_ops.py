"""Unit tests for the numerical kernels (ops layer) against torch-CPU oracles
and analytic identities."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from acids_transforms_tpu.ops.fft import istft, stft
from acids_transforms_tpu.ops.framing import frame, overlap_add, reshape_batches
from acids_transforms_tpu.ops.interp import interp_linear
from acids_transforms_tpu.ops.mulaw import mulaw_decode, mulaw_encode
from acids_transforms_tpu.ops.phase import (
    fdiff_backward,
    fdiff_central,
    fdiff_forward,
    fint_backward,
    fint_central,
    fint_forward,
    unwrap,
)
from acids_transforms_tpu.ops.windows import (
    dual_window,
    gaussian_dgt_window,
    get_window,
    hann_window,
)

RNG = np.random.default_rng(0)


# ------------------------------------------------------------------- framing
def test_frame_matches_strided_reference():
    x = RNG.standard_normal((2, 1000)).astype(np.float32)
    f = np.asarray(frame(jnp.asarray(x), 128, 32, -1))
    n = (1000 - 128) // 32 + 1
    assert f.shape == (2, n, 128)
    for t in range(n):
        np.testing.assert_allclose(f[:, t], x[:, t * 32: t * 32 + 128], rtol=0, atol=0)


def test_frame_non_divisor_hop():
    x = RNG.standard_normal(500).astype(np.float32)
    f = np.asarray(frame(jnp.asarray(x), 100, 33, -1))
    n = (500 - 100) // 33 + 1
    assert f.shape == (n, 100)
    for t in range(n):
        np.testing.assert_allclose(f[t], x[t * 33: t * 33 + 100])


def test_frame_short_signal_pads():
    x = np.ones(50, np.float32)
    f = np.asarray(frame(jnp.asarray(x), 128, 32, -1))
    assert f.shape == (1, 128)
    np.testing.assert_allclose(f[0, :50], 1.0)
    np.testing.assert_allclose(f[0, 50:], 0.0)


def test_overlap_add_inverts_framing_interior():
    x = RNG.standard_normal((3, 2048)).astype(np.float32)
    w, h = 512, 128
    f = frame(jnp.asarray(x), w, h, -1)
    y = np.asarray(overlap_add(f, h))
    overlap = w // h
    interior = slice(w, x.shape[-1] - w)
    np.testing.assert_allclose(
        y[:, interior], overlap * x[:, interior], rtol=1e-5, atol=1e-5
    )


def test_reshape_batches():
    x = jnp.zeros((2, 3, 4, 100))
    flat, batch = reshape_batches(x, 1)
    assert flat.shape == (24, 100) and batch == (2, 3, 4)


# ---------------------------------------------------------------- stft/istft
@pytest.mark.parametrize("impl", ["fft", "matmul"])
@pytest.mark.parametrize("n_fft,hop", [(1024, 256), (512, 128), (256, 64)])
def test_stft_parity_vs_torch(impl, n_fft, hop):
    x = RNG.standard_normal((2, 2, 8192)).astype(np.float32)
    wt = torch.hann_window(n_fft)
    ref = (
        torch.stft(
            torch.from_numpy(x.reshape(4, -1)),
            n_fft,
            hop,
            window=wt,
            return_complex=True,
            onesided=True,
        )
        .transpose(-2, -1)
        .numpy()
        .reshape(2, 2, -1, n_fft // 2 + 1)
    )
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop, hann_window(n_fft), impl=impl))
    assert ours.shape == ref.shape
    rel = np.abs(ours - ref).max() / np.abs(ref).max()
    assert rel < 1e-4, rel


@pytest.mark.parametrize("impl", ["fft", "matmul"])
def test_istft_parity_and_roundtrip(impl):
    n_fft, hop = 1024, 256
    x = RNG.standard_normal((3, 8192)).astype(np.float32)
    w = hann_window(n_fft)
    spec = stft(jnp.asarray(x), n_fft, hop, w, impl=impl)
    wt = torch.hann_window(n_fft)
    ref = torch.istft(
        torch.from_numpy(np.asarray(spec)).transpose(-2, -1),
        n_fft,
        hop,
        window=wt,
        onesided=True,
    ).numpy()
    ours = np.asarray(istft(spec, n_fft, hop, w, impl=impl))
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() / np.abs(ref).max() < 1e-4
    # exact LS round-trip against the original signal
    n = ours.shape[-1]
    assert np.abs(ours - x[:, :n]).max() < 1e-4


def test_gaussian_window_properties():
    w = np.asarray(gaussian_dgt_window(1024))
    assert w.shape == (1024,)
    assert abs(w.max() - 1.0) < 1e-3  # peak ~1 at centre
    assert w[0] < 0.02 and w[-1] < 0.02  # ~0.01 at edges
    assert np.all(w > 0)


def test_dual_window_pr_identity():
    """sum_k w(n-kh) d(n-kh) == 1 — the painless reconstruction identity."""
    n_fft, hop = 512, 128
    w = np.asarray(gaussian_dgt_window(n_fft), dtype=np.float64)
    d = np.asarray(dual_window(w, hop), dtype=np.float64)
    L = 4096
    acc = np.zeros(L)
    for k in range(-n_fft // hop - 1, L // hop + 1):
        lo = k * hop
        for n in range(max(0, lo), min(L, lo + n_fft)):
            acc[n] += w[n - lo] * d[n - lo]
    interior = acc[n_fft: L - n_fft]
    np.testing.assert_allclose(interior, 1.0, atol=1e-6)


# -------------------------------------------------------------------- mu-law
def test_mulaw_roundtrip_and_torch_parity():
    x = np.clip(RNG.standard_normal(10000).astype(np.float32) * 0.4, -1, 1)
    codes = np.asarray(mulaw_encode(jnp.asarray(x), 256))
    dec = np.asarray(mulaw_decode(jnp.asarray(codes), 256))
    assert codes.min() >= 0 and codes.max() <= 255
    # quantization error bounded by one mu-law step
    assert np.abs(dec - x).max() < 0.05
    # parity with torch-computed mu-law formula
    mu = 255.0
    xt = torch.from_numpy(x)
    ref_codes = ((torch.sign(xt) * torch.log1p(mu * torch.abs(xt)) / np.log1p(mu) + 1) / 2 * mu + 0.5).to(torch.int64)
    np.testing.assert_array_equal(codes, ref_codes.numpy())


# --------------------------------------------------------------------- phase
def test_unwrap_matches_numpy():
    p = np.cumsum(RNG.standard_normal((4, 64, 16)) * 2.0, axis=-2)
    wrapped = np.angle(np.exp(1j * p))
    ours = np.asarray(unwrap(jnp.asarray(wrapped)))
    ref = np.unwrap(wrapped, axis=-2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize(
    "fd,fi",
    [
        (fdiff_forward, fint_forward),
        (fdiff_backward, fint_backward),
    ],
)
def test_fdiff_fint_exact_roundtrip(fd, fi):
    x = RNG.standard_normal((2, 33, 8)).astype(np.float32)
    rec = np.asarray(fi(fd(jnp.asarray(x))))
    np.testing.assert_allclose(rec, x, atol=1e-5)


def test_fdiff_fint_central_roundtrip_even():
    x = RNG.standard_normal((2, 32, 8)).astype(np.float32)
    rec = np.asarray(fint_central(fdiff_central(jnp.asarray(x))))
    np.testing.assert_allclose(rec, x, atol=1e-4)


def test_fdiff_fint_central_odd_t_smooth():
    # odd T: the odd-parity chain offset is least-squares estimated from the
    # even-neighbor midpoints; on smooth signals the residual is the mean
    # curvature * step^2 / 2 — exact for linear-in-t signals, small for smooth
    t = np.linspace(0, 1, 33, dtype=np.float32)[:, None]
    lin = (3.0 * t + 0.5) * np.ones((1, 8), np.float32)
    rec = np.asarray(fint_central(fdiff_central(jnp.asarray(lin[None]))))
    np.testing.assert_allclose(rec, lin[None], atol=1e-4)
    smooth = np.sin(2 * np.pi * t) * np.ones((1, 8), np.float32)
    rec_s = np.asarray(fint_central(fdiff_central(jnp.asarray(smooth[None]))))
    err = np.abs(rec_s - smooth[None]).max()
    assert err < 0.02, err  # curvature-bounded, NOT the O(1) single-seed error


def test_factored_stft_istft_match_direct():
    # chunk-DFT factorization (impl="factored"): exact same semantics as the
    # direct GEMM for cosine-sum windows (ops/fft.py module comment)
    from acids_transforms_tpu.ops.fft import istft, stft, taps_for_window
    from acids_transforms_tpu.ops.windows import get_window

    x = RNG.standard_normal((2, 30000)).astype(np.float32)
    for name, n_fft, hop in [("hann", 1024, 256), ("hamming", 512, 128), ("blackman", 512, 256)]:
        w = get_window(name, n_fft)
        taps = taps_for_window(np.asarray(w))
        assert taps is not None, name
        ref = np.asarray(stft(jnp.asarray(x), n_fft, hop, w))
        fac = np.asarray(stft(jnp.asarray(x), n_fft, hop, w, impl="factored", taps=taps))
        assert np.abs(fac - ref).max() / np.abs(ref).max() < 1e-5, name
        rec_ref = np.asarray(istft(jnp.asarray(ref), n_fft, hop, w))
        rec_fac = np.asarray(istft(jnp.asarray(ref), n_fft, hop, w, impl="factored", taps=taps))
        assert np.abs(rec_fac - rec_ref).max() / np.abs(rec_ref).max() < 1e-5, name


def test_factored_requires_taps_and_divisor_hop():
    from acids_transforms_tpu.ops.fft import stft, taps_for_window
    from acids_transforms_tpu.ops.windows import get_window

    x = jnp.zeros(4096)
    with pytest.raises(ValueError):
        stft(x, 512, 128, get_window("bartlett", 512), impl="factored",
             taps=taps_for_window(np.asarray(get_window("bartlett", 512))))
    with pytest.raises(ValueError):
        stft(x, 512, 160, get_window("hann", 512), impl="factored",
             taps=taps_for_window(np.asarray(get_window("hann", 512))))


def test_interp_linear_matches_torch():
    x = RNG.standard_normal((2, 5, 40)).astype(np.float32)
    ours = np.asarray(interp_linear(jnp.asarray(x), 160))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), 160, mode="linear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_window_name_resolution():
    for name in ("hann", "hamming", "blackman", "bartlett"):
        w = np.asarray(get_window(name, 256))
        ref = getattr(torch, f"{name}_window")(256).numpy()
        np.testing.assert_allclose(w, ref, atol=1e-6)
    with pytest.raises(ValueError):
        get_window("nonexistent", 256)


def test_set_matmul_precision_api():
    from acids_transforms_tpu.ops.fft import matmul_precision, set_matmul_precision
    import jax

    orig = matmul_precision()
    try:
        set_matmul_precision("highest")
        assert matmul_precision() == jax.lax.Precision.HIGHEST
        set_matmul_precision(jax.lax.Precision.DEFAULT)
        assert matmul_precision() == jax.lax.Precision.DEFAULT
    finally:
        set_matmul_precision(orig)
    assert matmul_precision() == orig


def test_expi_low_precision_phase():
    """expi must upcast bf16/f16 phases like the complex transcendental it
    replaced did (lax.complex only accepts f32/f64) — bf16 features flow
    back through representation inverts (code-review r3)."""
    from acids_transforms_tpu.ops.phase import expi

    for dt in (jnp.bfloat16, jnp.float16, jnp.float32):
        ph = jnp.linspace(-4.0, 4.0, 16).astype(dt)
        z = expi(ph)
        assert z.dtype == jnp.complex64
        ref = jnp.cos(ph.astype(jnp.float32)) + 1j * jnp.sin(ph.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(z), np.asarray(ref), atol=1e-7)
    np.testing.assert_allclose(np.abs(np.asarray(expi(jnp.float32(0.3)))), 1.0, rtol=1e-7)
