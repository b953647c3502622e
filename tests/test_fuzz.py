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


# ------------------------------------------------------- mesh contract fuzz
# VERDICT r4 ask #8: randomized chains/shapes run under mesh= on the CPU
# mesh — value parity vs unmeshed for deterministic legs, the divisibility
# and rank error paths, and keyed-draw determinism per shard.  The input
# leaf rule's coincidental-B ambiguity (a replicated-INTENT leaf whose
# leading dim equals the global batch is sharded by the leaf rule) is a
# documented contract (PARITY.md multi-chip rows; outputs are
# disambiguated by the dual global/local trace since r5).
import jax  # noqa: E402


def _mesh_cases(n_cases):
    out = []
    for _ in range(n_cases):
        n_fft = int(RNG.choice([256, 512]))
        hop = n_fft // int(RNG.choice([2, 4]))
        mult = int(RNG.integers(1, 3))
        n_chunks = int(RNG.integers(2, 5))
        out.append((n_fft, hop, mult, n_chunks))
    return out


@pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the multi-device CPU mesh"
)
@pytest.mark.parametrize("n_fft,hop,mult,n_chunks", _mesh_cases(4))
def test_mesh_roundtrip_parity_fuzz(n_fft, hop, mult, n_chunks):
    """Deterministic (complex) session roundtrips under mesh= equal the
    unmeshed dispatch for randomized shapes/chains."""
    from acids_transforms_tpu.parallel import local_mesh
    from acids_transforms_tpu.streaming import scan_forward, scan_roundtrip

    mesh = local_mesh()
    B = mesh.devices.size * mult
    chunk = 2 * n_fft
    L = n_chunks * chunk
    x = jnp.asarray(RNG.standard_normal((B, L)).astype(np.float32) * 0.5)
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(n_fft=n_fft, hop_length=hop)
    y0 = scan_roundtrip(chain, x, chunk)
    ym = scan_roundtrip(chain, x, chunk, mesh=mesh)
    np.testing.assert_allclose(np.asarray(ym), np.asarray(y0), atol=1e-5)

    s0, st0 = scan_forward(chain, x, chunk)
    sm, stm = scan_forward(chain, x, chunk, mesh=mesh)
    assert float(jnp.max(jnp.abs(s0 - sm))) < 1e-4 * (
        float(jnp.max(jnp.abs(s0))) + 1e-9
    )
    for a, b in zip(jax.tree_util.tree_leaves(st0),
                    jax.tree_util.tree_leaves(stm)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the multi-device CPU mesh"
)
@pytest.mark.parametrize("n_fft,hop,mult,n_chunks", _mesh_cases(2))
def test_mesh_keyed_decode_determinism_fuzz(n_fft, hop, mult, n_chunks):
    """Keyed mesh decode: same key -> bit-equal across runs; different
    keys -> different draws; per-shard key folds give shards independent
    randomness (rows on different devices draw differently for identical
    magnitude inputs)."""
    from acids_transforms_tpu.parallel import local_mesh
    from acids_transforms_tpu.streaming import scan_invert

    mesh = local_mesh()
    n = mesh.devices.size
    B = n * mult
    chunk_frames = 2 * n_fft // hop
    Tm = n_chunks * chunk_frames
    mag_row = np.abs(
        RNG.standard_normal((Tm, n_fft // 2 + 1))
    ).astype(np.float32)
    mags = jnp.asarray(np.broadcast_to(mag_row, (B,) + mag_row.shape).copy())
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode="random"
    )
    k1, k2 = jax.random.PRNGKey(7), jax.random.PRNGKey(8)
    y_a = scan_invert(chain, mags, chunk_frames, inversion_mode="random",
                      key=k1, mesh=mesh)
    y_b = scan_invert(chain, mags, chunk_frames, inversion_mode="random",
                      key=k1, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_b))
    y_c = scan_invert(chain, mags, chunk_frames, inversion_mode="random",
                      key=k2, mesh=mesh)
    assert not np.allclose(np.asarray(y_a), np.asarray(y_c))
    # identical magnitudes on every row: rows on DIFFERENT shards must
    # draw independently (the fold-in contract) — compare the first row
    # of shard 0 with the first row of shard 1
    rows_per_shard = B // n
    a0 = np.asarray(y_a[0])
    a1 = np.asarray(y_a[rows_per_shard])
    assert not np.allclose(a0, a1)


@pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the multi-device CPU mesh"
)
def test_mesh_error_paths_fuzz():
    """Randomized bad configurations hit the loud error paths: batch not
    divisible, unbatched audio, unbatched spectra."""
    from acids_transforms_tpu.parallel import local_mesh
    from acids_transforms_tpu.streaming import (
        scan_forward,
        scan_invert,
        scan_roundtrip,
    )

    mesh = local_mesh()
    n = mesh.devices.size
    chain = T.OverlapAdd(256, 64) + T.RealtimeSTFT(n_fft=256, hop_length=64)
    for _ in range(3):
        B_bad = n * int(RNG.integers(1, 3)) + int(RNG.integers(1, n))
        x_bad = jnp.zeros((B_bad, 1024))
        with pytest.raises(ValueError, match="divisible"):
            scan_roundtrip(chain, x_bad, 512, mesh=mesh)
    with pytest.raises(ValueError, match="batch axis"):
        scan_forward(chain, jnp.zeros((2048,)), 512, mesh=mesh)
    with pytest.raises(ValueError, match="batch axis"):
        scan_invert(chain, jnp.zeros((32, 129)), 8,
                    inversion_mode="random", mesh=mesh)
