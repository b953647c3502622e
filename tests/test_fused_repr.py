"""Fused two-channel spectral-representation forward (Polar / PolarIF /
Cartesian chains; ops/pallas/spectral.py:fused_spectral_repr + fuse.py
dispatch).  Interpret mode on CPU — the same kernel compiles via Mosaic on
TPU (tools/sweep_repr.py measures it).

Phase comparisons are wrap-aware throughout: any two backends disagree by
exactly ±2π on bins whose phase lands within their mutual noise of ±π (the
nyquist bin — exactly real — does so systematically), and a quiet bin's
phase carries noise amplified by 1/|X|.  The meaningful metric is therefore
magnitude-weighted distance on the unit circle,
``w · |e^{iφ_a} − e^{iφ_b}|`` with ``w = |X| / max|X|`` — bounded by twice
the relative spectrum error, which is what the library budgets.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from acids_transforms_tpu import transforms as T
from acids_transforms_tpu import fuse
from acids_transforms_tpu.ops.pallas.spectral import fused_spectral_repr

RNG = np.random.default_rng(7)


def _chains(n_fft=512, hop=128, spectral=None, **rep_kwargs):
    spectral = spectral or T.STFT(n_fft=n_fft, hop_length=hop)
    mag_args = {"mode": "bipolar", "n_fft": n_fft}
    return {
        "polar": T.Mono() + spectral + T.Polar(
            magnitude_args=mag_args, **rep_kwargs
        ),
        "polarif": T.Mono() + spectral + T.PolarIF(
            magnitude_args=mag_args, **rep_kwargs
        ),
        "cartesian": T.Mono() + spectral + T.Cartesian(**rep_kwargs),
    }


def _signal(batch=(2, 2), n=4096):
    return jnp.asarray(RNG.standard_normal(batch + (n,)).astype(np.float32))


def _split(rep, y):
    if rep.stack is None:
        return y
    return jnp.take(y, 0, axis=rep.stack), jnp.take(y, 1, axis=rep.stack)


def _assert_close(chain, y_ref, y_f, tol_mag=1e-4, tol_ph=1e-3):
    rep = chain.transforms[-1]
    m_r, p_r = _split(rep, y_ref)
    m_f, p_f = _split(rep, y_f)
    e1 = float(jnp.max(jnp.abs(m_r - m_f)) / (jnp.max(jnp.abs(m_r)) + 1e-12))
    assert e1 < tol_mag, e1
    # channel 2: invert the representation back to phases (IF integrates;
    # ±2π flips disappear on the unit circle) and weight by magnitude
    pa = rep.phase.invert(p_r)
    pb = rep.phase.invert(p_f)
    if type(rep) is T.Cartesian:
        e2 = float(
            jnp.max(jnp.abs(p_r - p_f)) / (jnp.max(jnp.abs(p_r)) + 1e-12)
        )
        assert e2 < tol_mag, e2
        return
    mag = jnp.abs(rep.magnitude.invert(m_r))
    w = mag / jnp.max(mag)
    circ = jnp.abs(
        jnp.exp(1j * pa.astype(jnp.complex64))
        - jnp.exp(1j * pb.astype(jnp.complex64))
    )
    e2 = float(jnp.max(w * circ))
    assert e2 < tol_ph, e2


@pytest.mark.parametrize("kind", ["polar", "polarif", "cartesian"])
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_fused_repr_matches_chain(kind, backend):
    x = _signal()
    chain = _chains()[kind].fit(x)
    assert fuse.fusable(chain, backend)
    f = fuse.fuse_forward(chain, backend)
    _assert_close(chain, chain.forward(x), f(x))


@pytest.mark.parametrize("kind", ["polar", "polarif"])
def test_fused_repr_dgt_fullk(kind):
    # gaussian window -> full-K kernel path
    x = _signal()
    chain = _chains(spectral=T.DGT(n_fft=512, hop_length=128))[kind].fit(x)
    f = fuse.fuse_forward(chain, "pallas")
    _assert_close(chain, chain.forward(x), f(x))


def test_fused_repr_non_depad_layout():
    # 384 is not a 256-multiple: exercises the lane-padded (non-depad) layout
    x = _signal()
    chain = _chains(n_fft=384, hop=96)["polar"].fit(x)
    f = fuse.fuse_forward(chain, "pallas")
    _assert_close(chain, chain.forward(x), f(x))


def test_fused_repr_weighted_if():
    x = _signal()
    chain = (
        T.Mono()
        + T.STFT(n_fft=512, hop_length=128)
        + T.PolarIF(
            magnitude_args={"mode": "bipolar", "n_fft": 512},
            phase_args={"mode": "gaussian", "weighted": True},
        )
    ).fit(x)
    f = fuse.fuse_forward(chain, "pallas")
    _assert_close(chain, chain.forward(x), f(x))


def test_fused_repr_if_multi_tile_carry():
    # force >= 3 grid tiles so the IF recurrence crosses tile boundaries
    # (prev-phase VMEM carry) and >= 2 batch rows so the batch-boundary
    # stale-carry masking is exercised
    x = _signal(batch=(3,), n=16384)
    st = T.STFT(n_fft=512, hop_length=128)
    rep = T.PolarIF(magnitude_args={"mode": "bipolar", "n_fft": 512})
    chain = (T.Mono() + st + rep).fit(x)
    spec = (T.Mono() + st).forward(x)
    rep_f = chain.transforms[-1]
    mag_t = rep_f.magnitude
    y1, y2 = fused_spectral_repr(
        x, 512, 128, st.window, "if",
        mel_bank=mag_t.mel_bank,
        aff=(
            mag_t.norm.offset, mag_t.norm.scale,
            rep_f.phase.norm.offset, rep_f.phase.norm.scale,
        ),
        contrast="log1p",
        taps=st._window_taps,
        tile_t=40,  # T=129 frames -> 4 tiles
    )
    ref = rep_f.phase.forward(spec)
    # all rows, including every tile boundary, must agree (wrap-aware,
    # magnitude-weighted)
    pa = rep_f.phase.invert(ref)
    pb = rep_f.phase.invert(y2)
    w = jnp.abs(spec) / jnp.max(jnp.abs(spec))
    circ = jnp.abs(
        jnp.exp(1j * pa.astype(jnp.complex64))
        - jnp.exp(1j * pb.astype(jnp.complex64))
    )
    assert float(jnp.max(w * circ)) < 1e-3


def test_fused_repr_stack_none_returns_tuple():
    x = _signal()
    chain = _chains(stack=None)["polar"].fit(x)
    f = fuse.fuse_forward(chain, "pallas")
    y1, y2 = f(x)
    r1, r2 = chain.forward(x)
    assert y1.shape == r1.shape and y2.shape == r2.shape
    e1 = float(jnp.max(jnp.abs(y1 - r1)) / (jnp.max(jnp.abs(r1)) + 1e-12))
    assert e1 < 1e-4


def test_fused_repr_keep_nyquist_false():
    x = _signal()
    chain = _chains(keep_nyquist=False)["polar"].fit(x)
    f = fuse.fuse_forward(chain, "pallas")
    y = f(x)
    r = chain.forward(x)
    assert y.shape == r.shape
    _assert_close(chain, r, y)


def test_fused_repr_declines_nonlocal_stencils():
    st = T.STFT(n_fft=512, hop_length=128)
    mag_args = {"mode": "bipolar", "n_fft": 512}
    for phase_args in (
        {"mode": "gaussian", "method": "backward"},
        {"mode": "gaussian", "method": "central"},
    ):
        chain = T.Mono() + st + T.PolarIF(
            magnitude_args=mag_args, phase_args=phase_args
        )
        assert fuse._match_repr(chain, "xla") is None
    chain = T.Mono() + st + T.Polar(
        magnitude_args=mag_args, phase_args={"mode": "bipolar", "unwrap": True}
    )
    assert fuse._match_repr(chain, "xla") is None
    # log contrast declines the kernel but keeps the XLA fusion
    chain = T.Mono() + st + T.Polar(
        magnitude_args={"mode": "bipolar", "n_fft": 512, "contrast": "log"}
    )
    assert fuse._match_repr(chain, "pallas") is None
    assert fuse._match_repr(chain, "xla") is not None


def test_fused_repr_fallback_still_forward():
    # hop does not divide n_fft: pallas declines, xla fuses
    x = _signal()
    chain = _chains(n_fft=512, hop=100)["polar"].fit(x)
    assert fuse._match_repr(chain, "pallas") is None
    f = fuse.fuse_forward(chain, "xla")
    _assert_close(chain, chain.forward(x), f(x))


def test_fused_repr_differentiable():
    import jax

    x = _signal(batch=(1,), n=2048)
    chain = _chains()["polar"].fit(x)
    f = fuse.fuse_forward(chain, "pallas")
    xla = fuse.fuse_forward(chain, "xla")

    def loss_f(fn, v):
        y = fn(v)
        m = jnp.take(y, 0, axis=-2)  # magnitude channel only: the phase
        return jnp.sum(m * m)        # channel's grad is wrap-unstable

    g_k = jax.grad(lambda v: loss_f(f, v))(x)
    g_x = jax.grad(lambda v: loss_f(xla, v))(x)
    # custom_vjp pairs the kernel with the XLA VJP; the residual difference
    # is the kernel-vs-XLA primal error entering through the cotangent
    # (loss grad = 2*m), not a VJP mismatch
    rel = float(jnp.max(jnp.abs(g_k - g_x)) / (jnp.max(jnp.abs(g_x)) + 1e-12))
    assert rel < 1e-3


def test_repr_auto_gate_policy(monkeypatch):
    # the measured dispatch policy (tools/sweep_repr*.py, v5e): PolarIF
    # rides the kernel across its availability region; Polar/Cartesian
    # only on taps windows at 1024 <= n_fft <= 4096 (r3.18b)
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    mk = lambda n: {"mode": "bipolar", "n_fft": n}
    cases = [
        (T.STFT(n_fft=1024, hop_length=256), T.PolarIF(magnitude_args=mk(1024)), True),
        (T.STFT(n_fft=512, hop_length=128), T.PolarIF(magnitude_args=mk(512)), True),
        (T.DGT(n_fft=1024, hop_length=256), T.PolarIF(magnitude_args=mk(1024)), True),
        (T.STFT(n_fft=1024, hop_length=256), T.Polar(magnitude_args=mk(1024)), True),
        (T.STFT(n_fft=2048, hop_length=512), T.Polar(magnitude_args=mk(2048)), True),
        (T.STFT(n_fft=512, hop_length=128), T.Polar(magnitude_args=mk(512)), False),
        (T.DGT(n_fft=1024, hop_length=256), T.Polar(magnitude_args=mk(1024)), False),
        (T.STFT(n_fft=1024, hop_length=256), T.Cartesian(), True),
        (T.STFT(n_fft=512, hop_length=128), T.Cartesian(), False),
        (T.DGT(n_fft=1024, hop_length=256), T.Cartesian(), False),
        (T.STFT(n_fft=4096, hop_length=1024), T.Polar(magnitude_args=mk(4096)), True),
        (T.STFT(n_fft=4096, hop_length=1024), T.Cartesian(), True),
        (T.STFT(n_fft=8192, hop_length=2048), T.Cartesian(), False),
    ]
    for spec, rep, expect in cases:
        chain = T.Mono() + spec + rep
        got = fuse._repr_pallas_preferred(chain)
        assert got == expect, (type(spec).__name__, spec.n_fft, type(rep).__name__, got)
