"""Fused Pallas kernel tests (interpret mode on CPU; the same kernel
compiles via Mosaic on TPU — verified by bench.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acids_transforms_tpu import transforms as T
from acids_transforms_tpu.fuse import fit_fusable, fusable, fuse_fit, fuse_forward
from acids_transforms_tpu.ops.fft import stft
from acids_transforms_tpu.ops.mel import square_mel_banks
from acids_transforms_tpu.ops.pallas.spectral import fused_melspec, fused_melspec_stats
from acids_transforms_tpu.ops.windows import hann_window

RNG = np.random.default_rng(3)


def test_fused_melspec_matches_reference_path():
    x = RNG.standard_normal((2, 20000)).astype(np.float32)
    n_fft, hop = 1024, 256
    w = hann_window(n_fft)
    fwd, _ = square_mel_banks(n_fft, 44100)
    y = np.asarray(
        fused_melspec(jnp.asarray(x), n_fft, hop, w, jnp.asarray(fwd), 0.1, 2.0, "log1p")
    )
    spec = stft(jnp.asarray(x), n_fft, hop, w)
    ref = (np.log1p(np.abs(np.asarray(spec)) @ fwd) - 0.1) / 2.0
    assert y.shape == ref.shape
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-4


def test_fused_melspec_no_mel_and_contrasts():
    x = RNG.standard_normal(9000).astype(np.float32)
    n_fft, hop = 512, 128
    w = hann_window(n_fft)
    spec = stft(jnp.asarray(x), n_fft, hop, w)
    mag = np.abs(np.asarray(spec))
    for contrast, f in [
        ("log1p", np.log1p),
        ("none", lambda v: v),
    ]:
        y = np.asarray(fused_melspec(jnp.asarray(x), n_fft, hop, w, None, 0.0, 1.0, contrast))
        ref = f(mag)
        rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 1e-4, (contrast, rel)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_fuse_forward_dispatch(test_files, backend):
    sig, _ = test_files
    chain = T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=512
    )
    fitted = chain.fit(jnp.asarray(sig))
    assert fusable(fitted, backend)
    fused = fuse_forward(fitted, backend)
    y_fused = np.asarray(fused(jnp.asarray(sig)))
    y_ref = np.asarray(fitted.forward(jnp.asarray(sig)))
    assert y_fused.shape == y_ref.shape
    assert np.abs(y_fused - y_ref).max() / (np.abs(y_ref).max() + 1e-9) < 1e-4


def test_fuse_forward_pallas_handles_nyquist_drop_and_mono_options(test_files):
    sig, _ = test_files
    chain = T.Mono(normalize=True, squeeze=False) + T.STFT(
        n_fft=512, hop_length=128
    ) + T.Magnitude(mode="gaussian", contrast="log1p", mel=False, n_fft=512,
                    keep_nyquist=False)
    fitted = chain.fit(jnp.asarray(sig))
    assert fusable(fitted, "pallas")
    y_fused = np.asarray(fuse_forward(fitted, "pallas")(jnp.asarray(sig)))
    y_ref = np.asarray(fitted.forward(jnp.asarray(sig)))
    assert y_fused.shape == y_ref.shape
    assert np.abs(y_fused - y_ref).max() / (np.abs(y_ref).max() + 1e-9) < 1e-4
    # "log" contrast amplifies the kernel's bf16x3 error near silent bins —
    # the pallas matcher declines it (fuse.py) and falls back
    log_chain = (T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="gaussian", contrast="log", mel=False, n_fft=512
    )).fit(jnp.asarray(sig))
    assert not fusable(log_chain, "pallas")
    assert fusable(log_chain, "xla")


def test_fuse_forward_xla_handles_pallas_unfriendly_configs(test_files):
    sig, _ = test_files
    # non-divisor hop + dropped nyquist: XLA path fuses, Pallas path declines
    chain = T.Mono() + T.STFT(n_fft=512, hop_length=160) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=False, n_fft=512, keep_nyquist=False
    )
    fitted = chain.fit(jnp.asarray(sig))
    assert fusable(fitted, "xla") and not fusable(fitted, "pallas")
    y_fused = np.asarray(fuse_forward(fitted, "xla")(jnp.asarray(sig)))
    y_ref = np.asarray(fitted.forward(jnp.asarray(sig)))
    assert y_fused.shape == y_ref.shape
    assert np.abs(y_fused - y_ref).max() / (np.abs(y_ref).max() + 1e-9) < 1e-4


def test_fused_melspec_tile_sizes_agree():
    # explicit tile_t values (incl. non-128 sublane-aligned) match the default
    x = RNG.standard_normal((2, 20000)).astype(np.float32)
    n_fft, hop = 1024, 256
    w = hann_window(n_fft)
    base = np.asarray(fused_melspec(jnp.asarray(x), n_fft, hop, w, None))
    for tt in (64, 120, 256):
        y = np.asarray(fused_melspec(jnp.asarray(x), n_fft, hop, w, None, tile_t=tt))
        assert np.array_equal(y.shape, base.shape)
        assert np.abs(y - base).max() / np.abs(base).max() < 1e-5, tt


def test_fused_melspec_factored_matches_direct_kernel():
    # the chunk-factored formulation (taps=) is numerically interchangeable
    # with the full-K windowed kernel, for every cosine-sum window family
    from acids_transforms_tpu.ops.fft import taps_for_window
    from acids_transforms_tpu.ops.windows import get_window

    x = RNG.standard_normal((2, 16000)).astype(np.float32)
    for name, n_fft, hop in [("hann", 1024, 256), ("hamming", 512, 128), ("blackman", 512, 128)]:
        w = get_window(name, n_fft)
        taps = taps_for_window(np.asarray(w))
        assert taps is not None
        spec = stft(jnp.asarray(x), n_fft, hop, w)
        ref = np.log1p(np.abs(np.asarray(spec)))
        y = np.asarray(fused_melspec(jnp.asarray(x), n_fft, hop, w, None, taps=taps))
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-4, name


def test_fused_melspec_x4_more_accurate():
    # the 4-product bf16 split (x4=True, the n_fft>=4096 accuracy region,
    # fuse.py:_pallas_fused) matches the 3-product default and sits at
    # least as close to a float64 oracle, in both the dense and the
    # banded-block mel dispatch
    from acids_transforms_tpu.ops.fft import taps_for_window
    from acids_transforms_tpu.ops.pallas.spectral import mel_block_structure

    x = RNG.standard_normal((2, 8192)).astype(np.float32) * 0.3
    n_fft, hop = 512, 128
    w = hann_window(n_fft)
    taps = taps_for_window(np.asarray(w))
    fwd, _ = square_mel_banks(n_fft, 44100)
    blocks = mel_block_structure(fwd)
    assert blocks is not None

    half = n_fft // 2
    xp = np.pad(x.astype(np.float64), [(0, 0), (half, half)], mode="reflect")
    Tn = 1 + x.shape[-1] // hop
    frames = np.stack([xp[:, i * hop: i * hop + n_fft] for i in range(Tn)], axis=1)
    mel64 = np.abs(
        np.fft.rfft(frames * np.asarray(w, np.float64), axis=-1)
    ) @ np.asarray(fwd, np.float64)

    errs = {}
    for x4 in (False, True):
        for blk in (None, blocks):
            y = np.asarray(
                fused_melspec(
                    jnp.asarray(x), n_fft, hop, w, jnp.asarray(fwd),
                    contrast="none", taps=taps, mel_blocks=blk, x4=x4,
                )
            )[:, :Tn, : mel64.shape[-1]]
            errs[(x4, blk is not None)] = np.linalg.norm(y - mel64) / np.linalg.norm(mel64)
    # banded == dense for each split
    assert abs(errs[(False, True)] - errs[(False, False)]) < 1e-7
    assert abs(errs[(True, True)] - errs[(True, False)]) < 1e-7
    # the 4th product can only help, and everything stays inside the budget
    assert errs[(True, False)] <= errs[(False, False)] + 1e-7
    assert errs[(True, False)] < 1e-4


def test_fused_melspec_stats_factored():
    from acids_transforms_tpu.ops.fft import taps_for_window
    from acids_transforms_tpu.ops.windows import get_window

    x = RNG.standard_normal((2, 16000)).astype(np.float32)
    w = get_window("hann", 512)
    taps = taps_for_window(np.asarray(w))
    st = fused_melspec_stats(jnp.asarray(x), 512, 128, w, "log1p", taps=taps)
    cm = np.log1p(np.abs(np.asarray(stft(jnp.asarray(x), 512, 128, w))))
    assert st["count"] == cm.size
    assert abs(float(st["sum"]) - cm.sum()) / abs(cm.sum()) < 1e-4
    assert abs(float(st["max"]) - cm.max()) < 1e-3
    assert abs(float(st["min"]) - cm.min()) < 1e-3


def test_fused_melspec_stats_matches_direct():
    x = RNG.standard_normal((3, 17000)).astype(np.float32)
    n_fft, hop = 512, 128
    w = hann_window(n_fft)
    st = fused_melspec_stats(jnp.asarray(x), n_fft, hop, w, "log1p")
    cm = np.log1p(np.abs(np.asarray(stft(jnp.asarray(x), n_fft, hop, w))))
    assert st["count"] == cm.size
    assert abs(float(st["sum"]) - cm.sum()) / abs(cm.sum()) < 1e-4
    assert abs(float(st["sumsq"]) - (cm ** 2).sum()) / (cm ** 2).sum() < 1e-4
    assert abs(float(st["max"]) - cm.max()) < 1e-3
    assert abs(float(st["min"]) - cm.min()) < 1e-3


@pytest.mark.parametrize("mode", ["unipolar", "bipolar", "gaussian"])
def test_fuse_fit_matches_chain_fit(test_files, mode):
    sig, _ = test_files
    chain = T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode=mode, contrast="log1p", mel=True, n_fft=512
    )
    assert fit_fusable(chain)
    # backend="pallas": force the kernel-stats path (interpret off-TPU;
    # auto falls back to jfit on CPU by design)
    fitted_fused = fuse_fit(chain, backend="pallas")(jnp.asarray(sig))
    fitted_ref = chain.fit(jnp.asarray(sig))
    norm_f = fitted_fused[-1].norm
    norm_r = fitted_ref[-1].norm
    assert abs(float(norm_f.offset) - float(norm_r.offset)) < 1e-3
    assert abs(float(norm_f.scale) - float(norm_r.scale)) / abs(float(norm_r.scale)) < 1e-3
    # and the fitted chains produce matching outputs
    y_f = np.asarray(fitted_fused.forward(jnp.asarray(sig)))
    y_r = np.asarray(fitted_ref.forward(jnp.asarray(sig)))
    assert np.abs(y_f - y_r).max() / (np.abs(y_r).max() + 1e-9) < 1e-3


def test_fuse_forward_factored_impl_passes_taps(test_files):
    # ADVICE r2: a chain built with STFT(impl="factored") must fuse without
    # raising — _xla_fused forwards the transform's own cosine-sum taps
    sig, _ = test_files
    chain = T.Mono() + T.STFT(n_fft=512, hop_length=128, impl="factored") + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=512
    )
    fitted = chain.fit(jnp.asarray(sig))
    assert fusable(fitted, "xla")
    y_fused = np.asarray(fuse_forward(fitted, "xla")(jnp.asarray(sig)))
    y_ref = np.asarray(fitted.forward(jnp.asarray(sig)))
    assert np.abs(y_fused - y_ref).max() / (np.abs(y_ref).max() + 1e-9) < 1e-4


def test_fuse_fit_declines_log_contrast(test_files):
    # ADVICE r2: the kernel's bf16x3 magnitude error is unboundedly amplified
    # by log near silent bins and the min statistic lives exactly there —
    # fuse_fit must fall back to the exact cascade for log/log10
    sig, _ = test_files
    for contrast in ("log", "log10"):
        chain = T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
            mode="unipolar", contrast=contrast, mel=True, n_fft=512
        )
        assert not fit_fusable(chain)
        fitted = fuse_fit(chain, backend="pallas")(jnp.asarray(sig))  # falls back to jfit
        ref = chain.fit(jnp.asarray(sig))
        assert np.allclose(
            float(fitted[-1].norm.offset), float(ref[-1].norm.offset)
        )


def test_pallas_fused_is_differentiable(test_files):
    # kernel primal + XLA-formulation VJP (fuse.py _pallas_fused): gradients
    # of a spectral loss through the fused forward match the chain's
    sig, _ = test_files
    x = jnp.asarray(sig)
    chain = (T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        n_fft=512
    )).fit(x)
    fused = fuse_forward(chain, backend="pallas")
    g_fused = np.asarray(jax.grad(lambda v: jnp.sum(fused(v) ** 2))(x))
    g_ref = np.asarray(jax.grad(lambda v: jnp.sum(chain.forward(v) ** 2))(x))
    assert g_fused.shape == g_ref.shape
    assert np.abs(g_fused - g_ref).max() / (np.abs(g_ref).max() + 1e-9) < 1e-3


def test_fuse_fit_fallback_unmatched():
    chain = T.Stereo() + T.STFT()
    assert not fit_fusable(chain)
    assert fuse_fit(chain, backend="pallas") == chain.jfit
    # auto on a non-TPU host returns jfit regardless (interpreter gate)
    assert fuse_fit(chain) == chain.jfit


def test_fuse_forward_dgt_chain(test_files):
    # DGT + Magnitude (BASELINE config 4's forward) rides the same fused
    # formulation; the gaussian window has no cosine-sum taps so auto stays
    # on the XLA path, and the full-K pallas kernel serves explicit requests
    sig, _ = test_files
    chain = (T.Mono() + T.DGT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", mel=True, n_fft=512
    )).fit(jnp.asarray(sig))
    assert fusable(chain, "xla") and fusable(chain, "pallas")
    y_ref = np.asarray(chain.forward(jnp.asarray(sig)))
    for backend in ("xla", "pallas"):
        y = np.asarray(fuse_forward(chain, backend)(jnp.asarray(sig)))
        assert y.shape == y_ref.shape
        assert np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9) < 1e-4
    # realtime subclasses never match (they consume frames, not signals)
    rt = T.OverlapAdd(512, 128) + T.RealtimeSTFT(n_fft=512, hop_length=128)
    assert not fusable(rt, "xla")


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_fuse_forward_mfcc(test_files, backend):
    # the reference's MFCC (a MelSpectrogram: power spectrogram -> mel GEMM,
    # bin-major output) maps onto the fused kernel with power=2
    sig, _ = test_files
    for chain in (
        T.MFCC(n_fft=512, hop_length=128),
        T.Mono() + T.MFCC(n_fft=512, hop_length=128, norm_mode="gaussian"),
    ):
        fitted = chain.fit(jnp.asarray(sig))
        assert fusable(fitted, backend)
        y_f = np.asarray(fuse_forward(fitted, backend)(jnp.asarray(sig)))
        y_r = np.asarray(fitted.forward(jnp.asarray(sig)))
        assert y_f.shape == y_r.shape
        assert np.abs(y_f - y_r).max() / (np.abs(y_r).max() + 1e-9) < 1e-4
    # the true-DCT extension falls back to the chain
    dct = T.MFCC(n_fft=512, hop_length=128, n_mfcc=13)
    assert not fusable(dct)
    assert fuse_forward(dct) == dct.jforward


def test_fuse_forward_with_traced_transform(test_files):
    # serving jits fuse_forward with the transform as a pytree ARGUMENT
    # (serving.py:_fwd): every leaf (norm stats, windows, banks) is a
    # tracer, so the fused closures must not concretize them — regression
    # for the float(norm.offset) crash seen on the TPU serving path
    sig, _ = test_files
    x = jnp.asarray(sig)
    chain = (T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="gaussian", mel=True, n_fft=512
    )).fit(x)
    for backend in ("xla", "pallas"):
        y = np.asarray(
            jax.jit(lambda t, v, b=backend: fuse_forward(t, b)(v))(chain, x)
        )
        y_ref = np.asarray(chain.forward(x))
        assert np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9) < 1e-4
    # gaussian-window (no taps) full-K kernel under tracing too
    dgt_chain = (T.DGT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", mel=True, n_fft=512
    )).fit(x)
    y = np.asarray(
        jax.jit(lambda t, v: fuse_forward(t, "pallas")(v))(dgt_chain, x)
    )
    y_ref = np.asarray(dgt_chain.forward(x))
    assert np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9) < 1e-4


def test_gl_project_matches_roundtrip_interior():
    # the fused GL consistency projection == istft->stft for interior frames
    # (edge frames use the OLA-tail boundary instead of trim + reflect-repad)
    from acids_transforms_tpu.ops.fft import istft, taps_for_window
    from acids_transforms_tpu.ops.pallas.glstep import gl_project
    from acids_transforms_tpu.ops.windows import get_window

    n_fft, hop = 1024, 256
    w = get_window("hann", n_fft)
    taps = taps_for_window(np.asarray(w))
    x = RNG.standard_normal((2, 30000)).astype(np.float32)
    spec = stft(jnp.asarray(x), n_fft, hop, w)
    mag = jnp.abs(spec)
    ang = spec / jnp.maximum(mag, 1e-20)
    ore, oim = gl_project(
        mag, jnp.real(ang), jnp.imag(ang), n_fft, hop, taps, w
    )
    ref = np.asarray(stft(istft(spec, n_fft, hop, w), n_fft, hop, w))
    got = np.asarray(ore) + 1j * np.asarray(oim)
    e = 4
    rel = np.abs(got[:, e:-e] - ref[:, e:-e]).max() / np.abs(ref).max()
    assert rel < 1e-4, rel


@pytest.mark.parametrize(
    "n_fft,hop,iters",
    [
        (512, 128, 2),
        (512, 128, 3),
        (1024, 128, 2),  # overlap 8 (the relaxed <= HALO gate region)
    ],
)
def test_gl_chained_step_interior_matches_single_steps(n_fft, hop, iters):
    # make_gl_momentum_step(iters=k) chains k projection+momentum+renorm
    # passes inside one invocation (r3.8/r3.9).  Interior rows
    # (>= k*(overlap-1) frames from each signal edge) must equal k chained
    # single-step invocations bit-for-bit; only the signal-edge rows may
    # differ (the fused pass computes intermediate context rows locally
    # where the chained run reads zero-padded halo state).
    from acids_transforms_tpu.ops.fft import taps_for_window
    from acids_transforms_tpu.ops.pallas.glstep import make_gl_momentum_step
    from acids_transforms_tpu.ops.windows import get_window

    m = n_fft // hop - 1
    w = get_window("hann", n_fft)
    taps = taps_for_window(np.asarray(w))
    x = RNG.standard_normal((2, 8000)).astype(np.float32)
    spec = stft(jnp.asarray(x), n_fft, hop, w)
    mag = jnp.abs(spec)
    ang = spec / jnp.maximum(mag, 1e-20)

    mom = 0.99 / 1.99
    step1, to_rows, from_rows = make_gl_momentum_step(
        mag, n_fft, hop, taps, w, mom
    )
    stepk, _, _ = make_gl_momentum_step(
        mag, n_fft, hop, taps, w, mom, iters=iters
    )

    are, aim = to_rows(jnp.real(ang)), to_rows(jnp.imag(ang))
    z = jnp.zeros_like(are)
    chained = (are, aim, z, z)
    for _ in range(iters):
        chained = step1(*chained)
    fused = stepk(are, aim, z, z)
    sl = slice(iters * m, mag.shape[1] - iters * m)
    for got, ref in zip(fused, chained):
        ga = np.asarray(from_rows(got))[:, sl]
        gr = np.asarray(from_rows(ref))[:, sl]
        np.testing.assert_array_equal(ga, gr)


def test_gl_project_with_traced_window():
    # serving jits invert with the transform as an argument: the window
    # reaching gl_project is a tracer (regression: np.asarray crash)
    from acids_transforms_tpu.ops.fft import taps_for_window
    from acids_transforms_tpu.ops.pallas.glstep import gl_project
    from acids_transforms_tpu.ops.windows import get_window

    n_fft, hop = 512, 128
    w = get_window("hann", n_fft)
    taps = taps_for_window(np.asarray(w))
    x = RNG.standard_normal((1, 8000)).astype(np.float32)
    spec = stft(jnp.asarray(x), n_fft, hop, w)
    mag = jnp.abs(spec)
    ang = spec / jnp.maximum(mag, 1e-20)

    ore, oim = jax.jit(
        lambda wv, m, ar, ai: gl_project(m, ar, ai, n_fft, hop, taps, wv)
    )(w, mag, jnp.real(ang), jnp.imag(ang))
    assert np.isfinite(np.asarray(ore)).all()


def test_griffin_lim_fused_quality_parity():
    # the fused-projection GL converges like the XLA loop (same seed):
    # spectral convergence within a few percent on a harmonic signal
    from acids_transforms_tpu.ops.fft import taps_for_window
    from acids_transforms_tpu.ops.griffinlim import griffin_lim
    from acids_transforms_tpu.ops.windows import get_window

    n_fft, hop = 1024, 256
    w = get_window("hann", n_fft)
    taps = taps_for_window(np.asarray(w))
    t = np.arange(30000) / 44100
    x = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate([220, 440, 880]))
    x = jnp.asarray((x / np.abs(x).max()).astype(np.float32))
    mag = jnp.abs(stft(x[None], n_fft, hop, w))

    def sc(rec):
        R = jnp.abs(stft(rec, n_fft, hop, w))
        n = min(R.shape[-2], mag.shape[-2])
        return float(jnp.linalg.norm(R[:, :n] - mag[:, :n]) / jnp.linalg.norm(mag))

    rec_xla = griffin_lim(mag, n_fft, hop, w, n_iter=8, fused=False)
    rec_ker = griffin_lim(mag, n_fft, hop, w, n_iter=8, taps=taps, fused=True)
    s_x, s_k = sc(rec_xla), sc(rec_ker)
    assert s_k < max(1.15 * s_x, s_x + 0.02), (s_k, s_x)


def test_pghi_invert_fused_matches_scan_istft():
    """The one-kernel offline PGHI inversion (ops/pallas/pghi_kernel.py) is
    numerically the serial scan + ISTFT with the same silent-bin phases."""
    from acids_transforms_tpu.ops import pghi as P
    from acids_transforms_tpu.ops.fft import istft
    from acids_transforms_tpu.ops.pallas.pghi_kernel import (
        pghi_fused_available,
        pghi_invert_fused,
    )

    assert pghi_fused_available(1024, 256)
    assert pghi_fused_available(512, 64)   # lcm-packed, st=1 (hop | 128)
    assert pghi_fused_available(1024, 64)
    assert pghi_fused_available(768, 192)  # lcm-packed, q=2 st=3
    assert pghi_fused_available(640, 160)  # lcm-packed, q=4 st=5
    assert not pghi_fused_available(1024, 160)  # hop does not divide n_fft
    assert not pghi_fused_available(640, 20)    # q = 32 > packing cap
    assert not pghi_fused_available(512, 512)

    sr = 44100
    t = np.arange(30000) / sr
    x = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate([220, 440, 880]))
    x = (0.7 * x / np.abs(x).max()).astype(np.float32)
    dgt = T.DGT(n_fft=1024, hop_length=256)
    mag = jnp.abs(dgt.forward(jnp.asarray(np.stack([x, 0.5 * x]))))

    key = jax.random.PRNGKey(0)
    angles = 2.0 * jnp.pi * jax.random.uniform(key, mag.shape, dtype=mag.dtype)
    phase = P.pghi_scan(
        mag, dgt.gamma, 1024, 256, tolerance=dgt.tolerance,
        parallel=False, key=key, time_stencil="central",
    )
    rec_ref = np.asarray(istft(mag * jnp.exp(1j * phase), 1024, 256, dgt.inv_window))
    rec_fused = np.asarray(
        pghi_invert_fused(
            mag, dgt.gamma, 1024, 256, dgt.inv_window,
            tolerance=float(dgt.tolerance), angles=angles,
        )
    )
    assert rec_fused.shape == rec_ref.shape
    rel = np.abs(rec_fused - rec_ref).max() / np.abs(rec_ref).max()
    assert rel < 1e-4, rel


@pytest.mark.parametrize(
    "n_fft,hop",
    [
        (1024, 256),
        # hop neither a multiple nor a divisor of 128 (the phases-only
        # gate has no lane constraint; since the lcm-packed OLA this
        # shape rides the one-kernel INVERSION too — edge-shapes test)
        (768, 192),
    ],
)
def test_pghi_phases_fused_matches_scan(n_fft, hop):
    """The phases-only kernel mode equals the serial central scan."""
    from acids_transforms_tpu.ops import pghi as P
    from acids_transforms_tpu.ops.pallas.pghi_kernel import (
        pghi_phases_available,
        pghi_phases_fused,
    )

    assert pghi_phases_available(n_fft, hop)
    t = np.arange(20000) / 44100
    x = np.stack([
        np.sin(2 * np.pi * 330 * t), np.sin(2 * np.pi * 550 * t)
    ]).astype(np.float32)
    dgt = T.DGT(n_fft=n_fft, hop_length=hop)
    mag = jnp.abs(dgt.forward(jnp.asarray(x)))
    key = jax.random.PRNGKey(1)
    angles = 2.0 * jnp.pi * jax.random.uniform(key, mag.shape, dtype=mag.dtype)
    ref = np.asarray(P.pghi_scan(
        mag, dgt.gamma, n_fft, hop, tolerance=dgt.tolerance,
        parallel=False, key=key, time_stencil="central",
    ))
    got = np.asarray(pghi_phases_fused(
        mag, dgt.gamma, n_fft, hop, tolerance=float(dgt.tolerance),
        angles=angles,
    ))
    assert got.shape == ref.shape
    # compare on audible bins (silent-bin phases are random either way and
    # both draws are pinned to `angles`, so they match too)
    assert np.abs(got - ref).max() < 1e-3, np.abs(got - ref).max()


@pytest.mark.parametrize(
    "n_fft,hop,n_samples,batch",
    [
        (512, 256, 6000, 1),    # overlap 2, tiny T, single batch
        (512, 64, 9000, 2),     # overlap 8, lcm-packed q=2 st=1 (hop | 128)
        (512, 32, 6000, 1),     # overlap 16, packed q=4 st=1
        (1024, 64, 9000, 2),    # overlap 16, packed q=2 st=1, 2-chunk frames
        (256, 64, 6000, 2),     # overlap 4, packed q=2 (the dryrun shape)
        (768, 192, 9000, 2),    # overlap 4, lcm-packed q=2 st=3
        (640, 160, 6000, 1),    # overlap 4, lcm-packed q=4 st=5
        (1024, 256, 4000, 3),   # T < tile_f
    ],
)
def test_pghi_invert_fused_edge_shapes(n_fft, hop, n_samples, batch):
    """The fused PGHI kernel matches scan+ISTFT at overlap 2/8, tiny frame
    counts, and odd batch sizes (tile/OLA-tail boundary coverage)."""
    from acids_transforms_tpu.ops import pghi as P
    from acids_transforms_tpu.ops.fft import istft
    from acids_transforms_tpu.ops.pallas.pghi_kernel import pghi_invert_fused

    t = np.arange(n_samples) / 44100
    x = np.stack(
        [np.sin(2 * np.pi * (220 * (b + 1)) * t) for b in range(batch)]
    ).astype(np.float32)
    dgt = T.DGT(n_fft=n_fft, hop_length=hop)
    mag = jnp.abs(dgt.forward(jnp.asarray(x)))

    key = jax.random.PRNGKey(3)
    angles = 2.0 * jnp.pi * jax.random.uniform(key, mag.shape, dtype=mag.dtype)
    phase = P.pghi_scan(
        mag, dgt.gamma, n_fft, hop, tolerance=dgt.tolerance,
        parallel=False, key=key, time_stencil="central",
    )
    rec_ref = np.asarray(istft(mag * jnp.exp(1j * phase), n_fft, hop, dgt.inv_window))
    rec = np.asarray(
        pghi_invert_fused(
            mag, dgt.gamma, n_fft, hop, dgt.inv_window,
            tolerance=float(dgt.tolerance), angles=angles,
        )
    )
    assert rec.shape == rec_ref.shape
    rel = np.abs(rec - rec_ref).max() / (np.abs(rec_ref).max() + 1e-9)
    assert rel < 1e-4, (n_fft, hop, rel)


def test_pghi_fused_batch_slab_split_exact(monkeypatch):
    """Batches above the VMEM slab split exactly: kernel state is per-row,
    so a forced tiny slab (monkeypatched ``_slab_b``) must reproduce the
    unsplit call bit-for-bit when the silent-bin angles are pinned."""
    from acids_transforms_tpu.ops.pallas import pghi_kernel as K

    n_fft, hop, B = 512, 256, 12
    t = np.arange(6000) / 44100
    x = np.stack(
        [np.sin(2 * np.pi * (110 * (b + 1)) * t) for b in range(B)]
    ).astype(np.float32)
    dgt = T.DGT(n_fft=n_fft, hop_length=hop)
    mag = jnp.abs(dgt.forward(jnp.asarray(x)))
    angles = 2.0 * jnp.pi * jax.random.uniform(
        jax.random.PRNGKey(7), mag.shape, dtype=mag.dtype
    )
    kw = dict(tolerance=float(dgt.tolerance), angles=angles)

    ph_whole = np.asarray(
        K.pghi_phases_fused(mag, dgt.gamma, n_fft, hop, **kw))
    rec_whole = np.asarray(
        K.pghi_invert_fused(mag, dgt.gamma, n_fft, hop, dgt.inv_window, **kw))
    monkeypatch.setattr(K, "_slab_b", lambda *a, **k: 8)
    ph_split = np.asarray(
        K.pghi_phases_fused(mag, dgt.gamma, n_fft, hop, **kw))
    rec_split = np.asarray(
        K.pghi_invert_fused(mag, dgt.gamma, n_fft, hop, dgt.inv_window, **kw))
    np.testing.assert_array_equal(ph_split, ph_whole)
    np.testing.assert_array_equal(rec_split, rec_whole)


def test_griffin_lim_fullk_quality_parity():
    """The full-K momentum-GL kernel (no cosine taps: the DGT gaussian/dual
    window) converges like the XLA loop — spectral convergence within a few
    percent."""
    from acids_transforms_tpu.ops.griffinlim import griffin_lim

    t = np.arange(30000) / 44100
    x = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate([220, 440, 880]))
    x = (0.7 * x / np.abs(x).max()).astype(np.float32)
    dgt = T.DGT(n_fft=1024, hop_length=256)
    mag = jnp.abs(dgt.forward(jnp.asarray(x)))[None]
    w = dgt.inv_window

    def sc(rec):
        R = jnp.abs(stft(rec, 1024, 256, w))
        n = min(R.shape[-2], mag.shape[-2])
        return float(jnp.linalg.norm(R[:, :n] - mag[:, :n]) / jnp.linalg.norm(mag))

    s_x = sc(griffin_lim(mag, 1024, 256, w, n_iter=8, fused=False))
    s_k = sc(griffin_lim(mag, 1024, 256, w, n_iter=8, fused=True))
    assert s_k < max(1.15 * s_x, s_x + 0.02), (s_k, s_x)


def test_fuse_forward_fallback():
    chain = T.Stereo() + T.STFT()
    assert not fusable(chain)
    fn = fuse_forward(chain)
    assert fn == chain.jforward
    with pytest.raises(ValueError):
        fuse_forward(chain, backend="nope")


def test_nyq_depad_parity_adversarial():
    """The nyquist-depadded lane layout (r3.6): GEMMs at exactly F-1 lanes,
    nyquist as an exact f32 VPU reduce.  Checked on a nyquist-heavy signal
    (strong alternating component) against the exact DFT path, for both
    formulations and a multi-tap window, plus a shape where depad does not
    apply (non-256-multiple n_fft keeps the padded layout)."""
    from acids_transforms_tpu.ops.fft import taps_for_window
    from acids_transforms_tpu.ops.pallas.spectral import _nyq_depad
    from acids_transforms_tpu.ops.windows import get_window

    x = RNG.standard_normal((2, 6000)).astype(np.float32)
    x[0] += 0.7 * ((-1.0) ** np.arange(x.shape[-1])).astype(np.float32)
    for n_fft, hop, wname, expect_depad in [
        (512, 128, "hann", True),
        (512, 128, "blackman", True),   # P=2 exercises the patch loops
        (1024, 256, "hann", True),
        (640, 160, "hann", False),
    ]:
        assert _nyq_depad(n_fft, hop) == expect_depad
        w = get_window(wname, n_fft)
        taps = taps_for_window(np.asarray(w))
        spec = stft(jnp.asarray(x), n_fft, hop, w)
        ref = np.log1p(np.abs(np.asarray(spec)))
        for kw in (dict(taps=taps), dict()):
            y = np.asarray(
                fused_melspec(jnp.asarray(x), n_fft, hop, w, None, 0.0, 1.0, "log1p", **kw)
            )
            rel = np.abs(y - ref).max() / np.abs(ref).max()
            assert rel < 1.5e-4, (n_fft, wname, bool(kw), rel)
        st = fused_melspec_stats(jnp.asarray(x), n_fft, hop, w, "log1p", taps=taps)
        assert abs(float(st["max"]) - ref.max()) / ref.max() < 1e-4
        assert abs(float(st["sum"]) - ref.sum()) / abs(ref.sum()) < 1e-4


def test_fullk_nodup_layout_matches(monkeypatch):
    """The no-duplication [hi; lo] basis/mel layouts (r3.6c, VMEM diet for
    n_fft >= 4096) are MAC-identical to the 3-stack — exercised at a cheap
    shape by lowering the gate."""
    import acids_transforms_tpu.ops.pallas.spectral as S

    x = RNG.standard_normal((2, 6000)).astype(np.float32)
    n_fft, hop = 512, 128
    w = np.asarray(
        __import__(
            "acids_transforms_tpu.ops.windows", fromlist=["gaussian_dgt_window"]
        ).gaussian_dgt_window(n_fft)
    )
    fwd, _ = square_mel_banks(n_fft, 44100)

    def run():
        jax.clear_caches()
        out = {}
        for x4 in (False, True):
            for bank in (jnp.asarray(fwd), None):
                out[(x4, bank is None)] = np.asarray(
                    fused_melspec(
                        jnp.asarray(x), n_fft, hop, jnp.asarray(w, jnp.float32),
                        bank, 0.0, 1.0, "log1p", x4=x4,
                    )
                )
        st = fused_melspec_stats(
            jnp.asarray(x), n_fft, hop, jnp.asarray(w, jnp.float32), "log1p"
        )
        out["stats"] = {k: float(v) for k, v in st.items()}
        return out

    base = run()
    monkeypatch.setattr(S, "NODUP_MIN_NFFT", 256)
    nodup = run()
    for k in base:
        if k == "stats":
            for s in base[k]:
                assert abs(base[k][s] - nodup[k][s]) <= 1e-4 * max(1.0, abs(base[k][s]))
        else:
            # same multiplies, different summation order (two dots vs one
            # stacked dot) — f32 reordering level, far under the 1e-4
            # pipeline budget
            scale = np.abs(base[k]).max()
            assert np.abs(base[k] - nodup[k]).max() / scale < 5e-5, k


def test_fused_melspec_short_signal():
    """L <= n_fft//2 clips: the single-flip reflect pad cannot cover the
    centre pad — the multi-reflection fallback must match the XLA stft
    (review finding, r3.6)."""
    n_fft, hop = 1024, 256
    w = hann_window(n_fft)
    for L in (300, 512, 1023):
        x = RNG.standard_normal((2, L)).astype(np.float32)
        y = np.asarray(
            fused_melspec(jnp.asarray(x), n_fft, hop, w, None, 0.0, 1.0, "log1p")
        )
        ref = np.log1p(np.abs(np.asarray(stft(jnp.asarray(x), n_fft, hop, w))))
        assert y.shape == ref.shape, (L, y.shape, ref.shape)
        rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
        # mutual error of two independent bf16x3 paths on a tiny clip (the
        # pre-fix behaviour was a reshape crash, not an accuracy question)
        assert rel < 2e-4, (L, rel)


def test_pghi_bidir_quality_and_synthesis():
    """Bidirectional PGHI (r3.7): seed mid-signal, halve the serial depth.

    Output differs from the causal scan (different integration order) —
    the contract is spectral-convergence parity (within 15% across
    harmonic and noise content) plus: the synthesis-only kernel matches
    the library ISTFT, and the composed phases+synthesis path equals
    pghi_invert_fused bit-for-bit for the serial order."""
    from acids_transforms_tpu.ops.fft import istft, stft
    from acids_transforms_tpu.ops.pallas.pghi_kernel import (
        pghi_invert_bidir,
        pghi_invert_fused,
        pghi_phases_fused,
        pghi_synthesize_fused,
    )

    dgt = T.DGT(n_fft=512, hop_length=128)
    w, invw, gamma = dgt.window, dgt.inv_window, dgt.gamma
    key = jax.random.PRNGKey(7)

    sr = 44100
    t = np.arange(12000) / sr
    harm = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate([220, 440, 880]))
    harm = (0.7 * harm / np.abs(harm).max()).astype(np.float32)
    noise = RNG.standard_normal(12000).astype(np.float32) * 0.3

    for x in (harm, noise):
        mag = jnp.abs(stft(jnp.asarray(x)[None], 512, 128, w))

        def sc(y):
            R = jnp.abs(stft(y, 512, 128, w))
            n = min(R.shape[-2], mag.shape[-2])
            return float(
                jnp.linalg.norm(R[:, :n] - mag[:, :n]) / jnp.linalg.norm(mag)
            )

        y_ser = pghi_invert_fused(mag, gamma, 512, 128, invw, key=key)
        y_bid = pghi_invert_bidir(mag, gamma, 512, 128, invw, key=key)
        s_s, s_b = sc(y_ser), sc(y_bid)
        assert s_b < max(1.15 * s_s, s_s + 0.02), (s_b, s_s)

    # synthesis-only kernel == library istft on identical phases
    mag = jnp.abs(stft(jnp.asarray(harm)[None], 512, 128, w))
    ph = pghi_phases_fused(mag, gamma, 512, 128, key=key)
    y_lib = np.asarray(istft(mag * jnp.exp(1j * ph), 512, 128, invw))
    y_ker = np.asarray(pghi_synthesize_fused(mag, ph, 512, 128, invw))
    n = min(y_lib.shape[-1], y_ker.shape[-1])
    rel = np.abs(y_ker[..., :n] - y_lib[..., :n]).max() / np.abs(y_lib).max()
    assert rel < 1e-4, rel

    # phases + synthesis composition == the one-kernel inversion (serial)
    y_one = np.asarray(pghi_invert_fused(mag, gamma, 512, 128, invw, key=key))
    y_two = np.asarray(pghi_synthesize_fused(mag, ph, 512, 128, invw))
    n = min(y_one.shape[-1], y_two.shape[-1])
    assert np.abs(y_one[..., :n] - y_two[..., :n]).max() / np.abs(y_one).max() < 1e-6


def test_pghi_synthesize_fused_packed_hop():
    """phases_in synthesis at a packed small hop (hop | 128): the shared
    OLA layout (ops/pallas/ola.py) matches the library ISTFT — covers the
    bidirectional inversion's assembly stage at small hops."""
    from acids_transforms_tpu.ops.fft import istft, stft
    from acids_transforms_tpu.ops.pallas.pghi_kernel import (
        pghi_invert_bidir,
        pghi_phases_fused,
        pghi_synthesize_fused,
    )

    dgt = T.DGT(n_fft=512, hop_length=64)
    w, invw, gamma = dgt.window, dgt.inv_window, dgt.gamma
    key = jax.random.PRNGKey(3)
    t = np.arange(9000) / 44100
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    mag = jnp.abs(stft(jnp.asarray(x)[None], 512, 64, w))
    ph = pghi_phases_fused(mag, gamma, 512, 64, key=key)
    y_lib = np.asarray(istft(mag * jnp.exp(1j * ph), 512, 64, invw))
    y_ker = np.asarray(pghi_synthesize_fused(mag, ph, 512, 64, invw))
    n = min(y_lib.shape[-1], y_ker.shape[-1])
    rel = np.abs(y_ker[..., :n] - y_lib[..., :n]).max() / np.abs(y_lib).max()
    assert rel < 1e-4, rel
    # the full bidirectional inversion composes at the packed hop too
    y_bid = pghi_invert_bidir(mag, gamma, 512, 64, invw, key=key)
    R = jnp.abs(stft(y_bid, 512, 64, w))
    m = min(R.shape[-2], mag.shape[-2])
    sc = float(jnp.linalg.norm(R[:, :m] - mag[:, :m]) / jnp.linalg.norm(mag))
    assert sc < 0.2, sc


def test_pghi_bidir_inversion_mode():
    """`inversion_mode="pghi_bidir"` works through the transform API (and
    composes — the mode is registry-known)."""
    sr = 44100
    t = np.arange(10000) / sr
    x = (0.6 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    dgt = T.DGT(n_fft=512, hop_length=128)
    assert "pghi_bidir" in dgt.get_inversion_modes()
    spec = dgt.forward(jnp.asarray(x))
    rec = dgt.invert(jnp.abs(spec), inversion_mode="pghi_bidir")
    assert np.isfinite(np.asarray(rec)).all()
    chain = T.Mono() + T.DGT(n_fft=512, hop_length=128) + T.Magnitude(n_fft=512)
    chain = chain.fit(jnp.asarray(np.stack([x, x])))
    y = chain.jforward(jnp.asarray(np.stack([x, x])))
    rec2 = chain.invert(y, inversion_mode="pghi_bidir")
    assert np.isfinite(np.asarray(rec2)).all()


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_fuse_forward_bf16_output_contract(test_files, backend):
    """out_dtype=bfloat16 is exactly the f32 result rounded at the final
    store — on the Pallas path the rounding happens inside the kernel's HBM
    write (halving the output DMA), so bit-identity vs .astype is the
    contract, not a tolerance."""
    sig, _ = test_files
    chain = T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=512
    )
    fitted = chain.fit(jnp.asarray(sig))
    f32 = fuse_forward(fitted, backend)(jnp.asarray(sig))
    b16 = fuse_forward(fitted, backend, out_dtype=jnp.bfloat16)(jnp.asarray(sig))
    assert b16.dtype == jnp.bfloat16
    expected = f32.astype(jnp.bfloat16)
    assert np.array_equal(
        np.asarray(b16, dtype=np.float32), np.asarray(expected, dtype=np.float32)
    )


def test_fuse_forward_bf16_mfcc_and_fallback(test_files):
    sig, _ = test_files
    mf = T.MFCC(n_fft=512, hop_length=128, n_mels=128).fit(jnp.asarray(sig[:, 0]))
    y = fuse_forward(mf, "pallas", out_dtype=jnp.bfloat16)(jnp.asarray(sig[:, 0]))
    assert y.dtype == jnp.bfloat16
    ref = fuse_forward(mf, "pallas")(jnp.asarray(sig[:, 0])).astype(jnp.bfloat16)
    assert np.array_equal(
        np.asarray(y, dtype=np.float32), np.asarray(ref, dtype=np.float32)
    )
    # unmatched chain: fallback wraps jforward with a final cast
    mono = T.Mono()
    y2 = fuse_forward(mono, out_dtype=jnp.bfloat16)(jnp.asarray(sig))
    assert y2.dtype == jnp.bfloat16
    # complex-producing fallback raises instead of silently dropping imag
    st = T.STFT(n_fft=512, hop_length=128)
    with pytest.raises(ValueError, match="complex"):
        fuse_forward(st, out_dtype=jnp.bfloat16)(jnp.asarray(sig[:, 0]))


@pytest.mark.parametrize("factored", [True, False])
def test_fused_melspec_int16_bit_identity(factored):
    """int16 PCM input is bit-identical to feeding ``x.astype(f32)/32768``:
    the in-kernel convert is lossless (int16->f32) and the power-of-two
    scale only shifts exponents — on both the chunk-factored and full-K
    formulations, with and without the mel projection."""
    from acids_transforms_tpu.ops.fft import taps_for_window

    n_fft, hop = 512, 128
    w = hann_window(n_fft)
    taps = taps_for_window(np.asarray(w)) if factored else None
    xi = RNG.integers(-32768, 32768, size=(3, 9000), dtype=np.int16)
    xf = xi.astype(np.float32) / 32768.0
    bank = jnp.asarray(square_mel_banks(n_fft, 44100)[0])
    for mel in (bank, None):
        yf = fused_melspec(
            jnp.asarray(xf), n_fft, hop, w, mel, 0.1, 2.0, "log1p", taps=taps
        )
        yi = fused_melspec(
            jnp.asarray(xi), n_fft, hop, w, mel, 0.1, 2.0, "log1p", taps=taps
        )
        assert yi.dtype == yf.dtype
        assert np.array_equal(np.asarray(yf), np.asarray(yi))


def test_fused_melspec_int16_stats_and_rejects():
    """The one-pass fit statistics share the kernel's PCM read path; other
    dtypes are rejected loudly (the silent-trap rule)."""
    n_fft, hop = 512, 128
    w = hann_window(n_fft)
    xi = RNG.integers(-32768, 32768, size=(2, 9000), dtype=np.int16)
    xf = xi.astype(np.float32) / 32768.0
    sf = fused_melspec_stats(jnp.asarray(xf), n_fft, hop, w)
    si = fused_melspec_stats(jnp.asarray(xi), n_fft, hop, w)
    for k in ("sum", "sumsq", "min", "max"):
        assert np.array_equal(np.asarray(sf[k]), np.asarray(si[k])), k
    with pytest.raises(ValueError, match="float32 audio or int16"):
        fused_melspec(jnp.asarray(xi).astype(jnp.int32), n_fft, hop, w)
    with pytest.raises(ValueError, match="float32 audio or int16"):
        # bf16 audio would silently halve the input mantissa — reject
        fused_melspec(jnp.asarray(xf).astype(jnp.bfloat16), n_fft, hop, w)


def test_fuse_forward_int16_pcm(test_files):
    """Matched chains take int16 PCM and return exactly the float result;
    with a Mono mix the cast happens at entry, already-mono PCM rides the
    kernel's in-kernel convert.  MFCC chains too, on both backends."""
    sig, _ = test_files
    xi = np.clip(
        np.round(sig[:, 0] * 32768.0), -32768, 32767
    ).astype(np.int16)[None]
    xf = xi.astype(np.float32) / 32768.0
    chain = T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=512
    )
    fitted = chain.fit(jnp.asarray(xf))
    for backend in ("pallas", "xla"):
        fwd = fuse_forward(fitted, backend)
        assert np.array_equal(
            np.asarray(fwd(jnp.asarray(xi))), np.asarray(fwd(jnp.asarray(xf)))
        ), backend
    mf = T.MFCC(n_fft=512, hop_length=128, n_mels=128).fit(jnp.asarray(xf))
    for backend in ("pallas", "xla"):
        fwd = fuse_forward(mf, backend)
        assert np.array_equal(
            np.asarray(fwd(jnp.asarray(xi))), np.asarray(fwd(jnp.asarray(xf)))
        ), backend


def test_pallas_fused_bf16_is_differentiable(test_files):
    sig, _ = test_files
    chain = T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=512
    )
    fitted = chain.fit(jnp.asarray(sig))
    fwd = fuse_forward(fitted, "pallas", out_dtype=jnp.bfloat16)

    def loss(x):
        return jnp.sum(fwd(x).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(jnp.asarray(sig))
    assert g.shape == sig.shape
    assert np.isfinite(np.asarray(g)).all()


def _repr_fit_chain(kind):
    spec = dict(
        polar=lambda: T.STFT(n_fft=512, hop_length=128) + T.Polar(
            magnitude_args={"mode": "bipolar", "n_fft": 512}
        ),
        polarif=lambda: T.Mono() + T.STFT(n_fft=1024, hop_length=256)
        + T.PolarIF(magnitude_args={"mode": "unipolar", "n_fft": 1024}),
        polarif_weighted=lambda: T.STFT(n_fft=1024, hop_length=256)
        + T.PolarIF(
            magnitude_args={"mode": "gaussian", "n_fft": 1024},
            phase_args={"mode": "gaussian", "weighted": True},
        ),
        cartesian_dgt=lambda: T.DGT(n_fft=512, hop_length=128) + T.Cartesian(),
    )
    return spec[kind]()


@pytest.mark.parametrize(
    "kind", ["polar", "polarif", "polarif_weighted", "cartesian_dgt"]
)
def test_fuse_fit_repr_matches_chain_fit(kind):
    """fuse_fit on a stacked-representation chain fits BOTH channel norms
    from one kernel stats pass, matching chain.fit (fuse.py docstring:
    broadband content — silent-bin phases are atan2 of denormal noise,
    ill-conditioned in both paths)."""
    from acids_transforms_tpu.fuse import fit_fusable, fuse_fit

    chain = _repr_fit_chain(kind)
    assert fit_fusable(chain)
    rng = np.random.default_rng(7)
    t = np.arange(30000) / 44100
    x = (
        np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 1321 * t)
        + 0.05 * rng.standard_normal(t.size)
    ).astype(np.float32)
    xb = jnp.asarray(np.stack([x, 0.6 * x]))
    fitted_ref = chain.fit(xb)
    fitted_fus = fuse_fit(chain, backend="pallas")(xb)
    rep_r, rep_f = fitted_ref[-1], fitted_fus[-1]
    for ch in ("magnitude", "phase"):
        nr, nf = getattr(rep_r, ch).norm, getattr(rep_f, ch).norm
        assert type(nr) is type(nf)
        if not hasattr(nr, "offset"):
            continue  # Dummy channel: untouched
        s = abs(float(nr.scale)) + 1e-12
        assert abs(float(nf.offset) - float(nr.offset)) / s < 1e-3, (kind, ch)
        assert abs(float(nf.scale) - float(nr.scale)) / s < 1e-3, (kind, ch)
        assert nf.needs_scaling is False
    # the fitted chains forward identically (within kernel accuracy)
    y_r = np.asarray(fitted_ref.jforward(xb))
    y_f = np.asarray(fitted_fus.jforward(xb))
    assert np.abs(y_r - y_f).max() / (np.abs(y_r).max() + 1e-12) < 1e-3


def test_fuse_fit_repr_gates():
    """Repr fit gates mirror the melspec fit's: log contrasts and the
    full-K n_fft cap decline (exact-cascade fallback), masks fall back to
    chain.fit, unwrap-Polar never matches."""
    from acids_transforms_tpu.fuse import _match_repr_fit, fuse_fit

    log_chain = T.STFT(n_fft=512, hop_length=128) + T.Polar(
        magnitude_args={"mode": "bipolar", "n_fft": 512, "contrast": "log"}
    )
    assert _match_repr_fit(log_chain) is None
    # bound-method equality: same underlying jfit, fresh binding per access
    assert fuse_fit(log_chain, backend="pallas") == log_chain.jfit
    big_fullk = T.DGT(n_fft=4096, hop_length=1024) + T.Cartesian()
    assert _match_repr_fit(big_fullk) is None
    unwrap_polar = T.STFT(n_fft=512, hop_length=128) + T.Polar(
        magnitude_args={"mode": "bipolar", "n_fft": 512},
        phase_args={"mode": "bipolar", "unwrap": True},
    )
    assert _match_repr_fit(unwrap_polar) is None
    # mask path: exact masked cascade (bit-equal to chain.fit)
    chain = _repr_fit_chain("polar")
    x = jnp.asarray(
        np.sin(2 * np.pi * 330 * np.arange(8192) / 44100).astype(np.float32)
    )[None]
    mask = jnp.ones((1, 8192), bool).at[:, 6000:].set(False)
    f_ref = chain.fit(x, mask=mask)
    f_fus = fuse_fit(chain, backend="pallas")(x, mask=mask)
    nr, nf = f_ref[-1].magnitude.norm, f_fus[-1].magnitude.norm
    assert float(nr.offset) == float(nf.offset)
    assert float(nr.scale) == float(nf.scale)


def test_pghi_up_depad_optin_matches_default(monkeypatch):
    """The env-gated UP-fill lane depad (a measured scheduling negative,
    BENCH_NOTES r3.19) must stay numerically equivalent to the full-width
    fill: same anchors, same composition, associativity-only reordering."""
    from acids_transforms_tpu.ops.pallas import pghi_kernel as K

    t = np.arange(9000) / 44100
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    dgt = T.DGT(n_fft=512, hop_length=128)
    mag = jnp.abs(dgt.forward(jnp.asarray(x)[None]))
    key = jax.random.PRNGKey(5)
    angles = 2.0 * jnp.pi * jax.random.uniform(key, mag.shape, mag.dtype)

    def run():
        # fresh traces: the jitted caller captures UP_DEPAD at trace time
        jax.clear_caches()
        return np.asarray(
            K.pghi_phases_fused(
                mag, dgt.gamma, 512, 128, tolerance=float(dgt.tolerance),
                angles=angles,
            )
        )

    monkeypatch.setattr(K, "UP_DEPAD", False)
    ph_full = run()
    monkeypatch.setattr(K, "UP_DEPAD", True)
    ph_depad = run()
    jax.clear_caches()
    assert np.abs(ph_full - ph_depad).max() < 1e-4


def test_review_r3_gates_and_contracts(test_files):
    """r3 review fixes, pinned: (a) mel-bank/n_fft mismatch declines the
    Pallas matcher (it would zero-pad the short bank and return silently
    wrong features); (b) explicit backend='pallas' on an uncovered chain
    raises instead of silently returning chain.jforward; (c) fuse_fit on a
    Mono PCM chain converts int16 before the mix (stats equal the
    pre-converted float fit); (d) fuse_fit validates its backend."""
    sig, _ = test_files
    mismatched = T.STFT(n_fft=2048, hop_length=512) + T.Magnitude(
        mode="unipolar", mel=True, n_fft=1024
    )
    assert not fusable(mismatched, "pallas")
    assert not fusable(mismatched, "xla")

    log_chain = (T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", contrast="log", mel=False, n_fft=512
    )).fit(jnp.asarray(sig))
    with pytest.raises(ValueError, match="backend='pallas'"):
        fuse_forward(log_chain, backend="pallas")

    xi = np.clip(
        np.round(sig[:1] * 32768.0), -32768, 32767
    ).astype(np.int16)
    xf = xi.astype(np.float32) / 32768.0
    pcm_chain = T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=512
    )
    ff = fuse_fit(pcm_chain, backend="pallas")
    n_i = ff(jnp.asarray(xi))[-1].norm
    n_f = ff(jnp.asarray(xf))[-1].norm
    assert abs(float(n_i.offset) - float(n_f.offset)) < 1e-6
    assert abs(float(n_i.scale) - float(n_f.scale)) < 1e-6

    with pytest.raises(ValueError, match="backend"):
        fuse_fit(pcm_chain, backend="fused")


def test_gl_stage_prefixes_preserve_default():
    """The floor-sweep ``stages=`` prefixes (tools/sweep_gl_floor.py) are
    debug-only: every prefix compiles and returns finite outputs, and the
    full-depth ``stages=5`` kernel is BIT-equal to the default path (the
    shipped GL iteration must not be perturbed by the instrumentation)."""
    import jax

    from acids_transforms_tpu.ops.fft import stft, taps_for_window
    from acids_transforms_tpu.ops.pallas.glstep import make_gl_momentum_step
    from acids_transforms_tpu.ops.windows import hann_window

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    w = hann_window(512)
    taps = taps_for_window(w)
    mag = jnp.abs(stft(x, 512, 128, w))
    ang = jax.random.uniform(
        jax.random.PRNGKey(0), mag.shape, minval=-3.0, maxval=3.0
    )
    are0, aim0 = jnp.cos(ang), jnp.sin(ang)

    ref_step, to_rows, _ = make_gl_momentum_step(mag, 512, 128, taps, w, 0.99)
    a, b = to_rows(are0), to_rows(aim0)
    z = jnp.zeros_like(a)
    ref = ref_step(a, b, z, z)
    for s in range(6):
        st, _, _ = make_gl_momentum_step(
            mag, 512, 128, taps, w, 0.99, stages=s
        )
        outs = st(a, b, z, z)
        assert all(bool(jnp.all(jnp.isfinite(o))) for o in outs), s
    full = make_gl_momentum_step(mag, 512, 128, taps, w, 0.99, stages=5)[0](
        a, b, z, z
    )
    for r, f in zip(ref, full):
        assert bool(jnp.all(r == f))
