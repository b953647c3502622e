"""CompiledTransform serving wrapper: bucket dispatch, trim correctness,
snapshot/refresh semantics, bucketed invert, warmup compilation count."""
import numpy as np
import pytest
import jax.numpy as jnp

from acids_transforms_tpu import transforms as T
from acids_transforms_tpu.serving import CompiledTransform

RNG = np.random.default_rng(9)


@pytest.fixture(scope="module")
def server():
    chain = T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", mel=False, n_fft=512
    )
    fit_x = jnp.asarray(RNG.standard_normal((2, 8192)).astype(np.float32))
    chain = chain.fit(fit_x)
    return CompiledTransform(chain, buckets=(8192, 16384), batch_sizes=(2, 4))


def test_forward_matches_unpadded(server):
    x = RNG.standard_normal((2, 7000)).astype(np.float32)
    y = server.forward(jnp.asarray(x))
    ref = server.transform.forward(jnp.asarray(x))
    assert y.shape == ref.shape
    # interior frames are bit-identical; the last window of frames sees the
    # bucket zero-padding instead of reflect padding (documented)
    t_interior = (7000 - 512 // 2) // 128
    np.testing.assert_allclose(
        np.asarray(y)[..., :t_interior, :], np.asarray(ref)[..., :t_interior, :], atol=1e-5
    )


def test_batch_and_length_padding(server):
    x = RNG.standard_normal((3, 10000)).astype(np.float32)  # batch 3 -> 4, len -> 16384
    y = server.forward(jnp.asarray(x))
    assert y.shape[0] == 3
    assert y.shape[-2] == 10000 // 128 + 1


def test_out_of_range_raises(server):
    with pytest.raises(ValueError):
        server.forward(jnp.zeros((2, 100000)))
    with pytest.raises(ValueError):
        server.forward(jnp.zeros((5, 1000)))


def test_warmup_counts(server):
    # 2 buckets x 2 batch sizes, forward + invert each
    assert server.warmup() == 8


def test_invert_path(server):
    x = RNG.standard_normal((2, 8192)).astype(np.float32)
    y = server.forward(jnp.asarray(x))
    m = server.invert(y)
    assert np.isfinite(np.asarray(m)).all()


def test_invert_bucketed_shape_discipline(server):
    """Distinct frame counts inside one bucket share one inverse executable."""
    before = server._inv._cache_size()
    for t_frames in (40, 50, 60):  # all <= 8192 // 128 + 1 = 65
        y = jnp.asarray(RNG.standard_normal((2, t_frames, 257)).astype(np.float32))
        out = server.invert(y)
        # true output length for the *unpadded* frame count
        assert out.shape[-1] == (t_frames - 1) * 128
    assert server._inv._cache_size() - before <= 1


def test_invert_matches_unbucketed_interior(server):
    y = jnp.asarray(0.1 * np.abs(RNG.standard_normal((2, 50, 257))).astype(np.float32))
    rec = server.invert(y)
    ref = server.transform.invert(y, inversion_mode="griffin_lim")
    assert rec.shape == ref.shape


def test_mfcc_bin_major_trim():
    """ADVICE r1: bin-major (n_mels, T) outputs must trim the frame axis,
    not the mel axis."""
    chain = T.ComposeAudioTransform([T.MFCC(n_fft=512, hop_length=128, n_mels=64)])
    server = CompiledTransform(chain, buckets=(8192, 16384), batch_sizes=(2,))
    x = jnp.asarray(RNG.standard_normal((2, 7000)).astype(np.float32))
    y = server.forward(x)
    ref = chain.forward(x)
    assert y.shape == ref.shape  # (2, 64, 55), not (2, 55, ...)
    t_interior = (7000 - 512 // 2) // 128
    # the server now dispatches MFCC chains to the fused forward (fuse.py),
    # a different-but-equal formulation: compare relatively (power-spec
    # values reach ~1e3; measured 3.5e-7 rel)
    np.testing.assert_allclose(
        np.asarray(y)[..., :t_interior], np.asarray(ref)[..., :t_interior],
        rtol=1e-5, atol=1e-4,
    )


def test_refit_requires_refresh():
    """ADVICE r1: the server executes a snapshot — an eager refit changes
    nothing until refresh(), identically for fused and non-fused chains."""
    fit_x = jnp.asarray(RNG.standard_normal((2, 1, 8192)).astype(np.float32))
    x = jnp.asarray(RNG.standard_normal((2, 1, 8192)).astype(np.float32))
    for mel in (True, False):  # mel=True matches the fused dispatch
        chain = T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
            mode="unipolar", mel=mel, n_fft=512
        )
        chain.scale_data(fit_x)
        server = CompiledTransform(chain, buckets=(8192,), batch_sizes=(2,))
        y0 = np.asarray(server.forward(x))
        chain.scale_data(100.0 * fit_x)  # refit the live transform
        y1 = np.asarray(server.forward(x))
        np.testing.assert_allclose(y0, y1)  # snapshot: unchanged
        server.refresh()
        y2 = np.asarray(server.forward(x))
        ref = np.asarray(chain.forward(x))
        np.testing.assert_allclose(y2, ref, atol=2e-4)
        assert np.abs(y2 - y0).max() > 1e-3  # refit now visible


def test_window_chain_zero_postwarmup_compiles():
    """VERDICT r2 #6: the frame ladder is chain-exact (eval_shape over the
    actual chain), so warmup() provably covers every runtime invert shape —
    a Window chain's T = (b - wsize)//hop + 1 differs from the STFT formula
    and used to compile outside the warmed set."""
    chain = T.ComposeAudioTransform([T.Window(window_size=512, hop_size=256)])
    server = CompiledTransform(chain, buckets=(4096, 8192), batch_sizes=(2,))
    server.warmup()
    fwd_before = server._fwd._cache_size()
    inv_before = server._inv._cache_size()
    for L in (3000, 4096, 5000, 8192):
        x = jnp.asarray(RNG.standard_normal((2, L)).astype(np.float32))
        y = server.forward(x)
        rec = server.invert(y)
        assert np.isfinite(np.asarray(rec)).all()
    assert server._fwd._cache_size() == fwd_before, "forward compiled post-warmup"
    assert server._inv._cache_size() == inv_before, "invert compiled post-warmup"
    # the ladder matches what the chain actually produces
    assert server._t_ladder() == ((4096 - 512) // 256 + 1, (8192 - 512) // 256 + 1)


def test_mfcc_chain_zero_postwarmup_compiles():
    """Bin-major MFCC output (frames on -1): the ladder derives from the real
    frame axis; forwards never compile outside the warmed set."""
    chain = T.ComposeAudioTransform([T.MFCC(n_fft=512, hop_length=128, n_mels=64)])
    server = CompiledTransform(chain, buckets=(4096, 8192), batch_sizes=(2,))
    server.warmup()
    before = server._fwd._cache_size()
    for L in (3000, 4096, 6000, 8192):
        x = jnp.asarray(RNG.standard_normal((2, L)).astype(np.float32))
        server.forward(x)
    assert server._fwd._cache_size() == before
    assert server._t_ladder() == (4096 // 128 + 1, 8192 // 128 + 1)


def test_serving_int16_pcm_ingest():
    """Raw-PCM serving: warmup(dtypes=(int16,)) covers the PCM executables,
    forward(int16) is bit-identical to forward of the pre-converted float
    (bucket zero-padding is exact: 0/32768 == 0.0), and unmatched chains
    reject PCM loudly instead of computing on unscaled integers."""
    xi = RNG.integers(-32768, 32768, size=(2, 8192), dtype=np.int16)
    xf = xi.astype(np.float32) / 32768.0
    chain = (
        T.ComposeAudioTransform([T.STFT(n_fft=512, hop_length=128)])
        + T.Magnitude(mode="unipolar", contrast="log1p", mel=True, n_fft=512)
    ).fit(jnp.asarray(xf))
    server = CompiledTransform(chain, buckets=(8192, 12288), batch_sizes=(2,))
    n = server.warmup(dtypes=(jnp.float32, jnp.int16))
    # 2 buckets x 1 batch: f32 fwd+inv pairs (4), then int16 forwards (2)
    assert n == 6, n
    before = server._fwd._cache_size()
    for L in (6000, 8192, 12000):
        y_i = np.asarray(server.forward(jnp.asarray(xi[:, :L])))
        y_f = np.asarray(server.forward(jnp.asarray(xf[:, :L])))
        assert np.array_equal(y_i, y_f), L
    assert server._fwd._cache_size() == before, "PCM compiled post-warmup"
    # unmatched chain: loud rejection in both entry points
    raw = T.ComposeAudioTransform([T.MuLaw()])
    server_raw = CompiledTransform(raw, buckets=(8192,), batch_sizes=(2,))
    with pytest.raises(ValueError, match="int16"):
        server_raw.forward(jnp.asarray(xi))
    with pytest.raises(ValueError, match="int16"):
        server_raw.warmup(dtypes=(jnp.int16,))


def test_frame_axis_protocol():
    stft_chain = T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode=None, mel=False, n_fft=512
    )
    assert stft_chain.output_frame_axis(None) == -2
    assert (T.MFCC()).output_frame_axis(None) == -1
    assert (T.STFT() + T.Transpose(dims=(-2, -1))).output_frame_axis(None) == -1
    assert (T.STFT() + T.Unsqueeze(dim=-1)).output_frame_axis(None) == -3
    assert (T.STFT() + T.Polar(stack=-2)).output_frame_axis(None) == -3
    assert (T.Mono()).output_frame_axis(None) is None


def test_serving_4096_region_matches_chain():
    """The r3.5 x4 accuracy region (n_fft=4096) through the serving path:
    the fused forward (pallas on TPU, interpret here) with the transform as
    a traced pytree argument must match the chain inside the 1e-4 budget —
    exercises the x4 static-flag plumbing under serving's jit
    (fuse.py:_pallas_fused x4=n_fft>=4096)."""
    chain = T.Mono() + T.STFT(n_fft=4096, hop_length=512) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=4096
    )
    fit_x = jnp.asarray(RNG.standard_normal((2, 32768)).astype(np.float32))
    chain = chain.fit(fit_x)
    server = CompiledTransform(chain, buckets=(32768,), batch_sizes=(2,))
    x = jnp.asarray(RNG.standard_normal((2, 30000)).astype(np.float32))
    y = np.asarray(server.forward(x))
    ref = np.asarray(chain.forward(x))
    assert y.shape == ref.shape
    # interior frames only: the last window of frames sees the bucket
    # zero-padding instead of reflect padding (documented, matches
    # test_forward_matches_unpadded)
    t_interior = (30000 - 4096 // 2) // 512
    d = np.abs(y - ref)[..., :t_interior, :]
    assert d.max() / np.abs(ref).max() < 1e-4


def test_serving_dgt_chain_roundtrip():
    """The flagship DGT + Magnitude chain through the serving wrapper: the
    fused dispatch (since r3.6, DGT chains ride the Pallas kernel on TPU —
    here the XLA/interpret equivalent), the eval_shape frame ladder, and
    the bucketed invert must all accept the gaussian-window layout."""
    chain = T.Mono() + T.DGT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", mel=True, n_fft=512
    )
    fit_x = jnp.asarray(RNG.standard_normal((2, 2, 8192)).astype(np.float32))
    chain = chain.fit(fit_x)
    srv = CompiledTransform(chain, buckets=(8192,), batch_sizes=(2,))
    x = RNG.standard_normal((2, 2, 7000)).astype(np.float32)
    y = srv.forward(jnp.asarray(x))
    ref = chain.forward(jnp.asarray(x))
    assert y.shape == ref.shape
    t_interior = (7000 - 256) // 128
    np.testing.assert_allclose(
        np.asarray(y)[..., :t_interior, :],
        np.asarray(ref)[..., :t_interior, :],
        atol=1e-4, rtol=1e-3,
    )
    rec = srv.invert(y)  # DGT's configured default mode (pghi)
    assert np.isfinite(np.asarray(rec)).all()


def test_serving_stacked_representation_roundtrip():
    """A stacked two-channel representation chain (PolarIF) through the
    serving wrapper: the fused dispatch (fusable covers repr chains), the
    eval_shape frame ladder over the stacked (-2) channel layout, and the
    bucketed invert (IF integration -> complex -> ISTFT) must all work."""
    # mel=False: the exactness claim below needs the invertible magnitude
    # (the default mel pseudo-inverse is lossy by the square bank's rank)
    chain = T.Mono() + T.STFT(n_fft=512, hop_length=128) + T.PolarIF(
        magnitude_args={"mode": "unipolar", "mel": False, "n_fft": 512}
    )
    fit_x = jnp.asarray(RNG.standard_normal((2, 2, 8192)).astype(np.float32))
    chain = chain.fit(fit_x)
    srv = CompiledTransform(chain, buckets=(8192,), batch_sizes=(2,))
    x = RNG.standard_normal((2, 2, 7000)).astype(np.float32)
    y = srv.forward(jnp.asarray(x))
    ref = chain.forward(jnp.asarray(x))
    assert y.shape == ref.shape
    t_interior = (7000 - 256) // 128
    np.testing.assert_allclose(
        np.asarray(y)[..., :t_interior, :, :],
        np.asarray(ref)[..., :t_interior, :, :],
        atol=1e-4, rtol=1e-3,
    )
    rec = srv.invert(y)
    assert np.isfinite(np.asarray(rec)).all()
    # phase-faithful IF round trip: the served invert reconstructs audio
    # whose spectrogram matches the input's (Mono.invert re-adds the
    # channel dim — flatten it before comparing spectra)
    stft_t = T.STFT(n_fft=512, hop_length=128)
    mono_x = T.Mono().forward(jnp.asarray(x))
    rec2 = jnp.asarray(rec).reshape(mono_x.shape[0], -1)[:, : mono_x.shape[-1]]
    mag_rec = jnp.abs(stft_t.forward(rec2))
    mag_ref = jnp.abs(stft_t.forward(mono_x))
    n = min(mag_rec.shape[-2], mag_ref.shape[-2]) - 4
    sc = float(
        jnp.linalg.norm(mag_rec[:, 2:n, :] - mag_ref[:, 2:n, :])
        / jnp.linalg.norm(mag_ref[:, 2:n, :])
    )
    assert sc < 1e-4, sc


def test_serving_ctor_contracts():
    """r3 review fixes: tuple-output representations are rejected at
    construction with the fix in the message, and unsorted bucket ladders
    are sorted (the ladder-exceeded error reads buckets[-1] as the max)."""
    with pytest.raises(ValueError, match="stack"):
        CompiledTransform(
            T.STFT(n_fft=512, hop_length=128) + T.Polar(stack=None),
            buckets=(8192,),
        )
    chain = (T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", mel=False, n_fft=512
    )).fit(jnp.asarray(RNG.standard_normal((2, 8192)).astype(np.float32)))
    srv = CompiledTransform(chain, buckets=(16384, 8192), batch_sizes=(2,))
    assert srv.buckets == (8192, 16384)
    with pytest.raises(ValueError, match="16384"):
        srv.forward(jnp.zeros((2, 20000), jnp.float32))


# ===================================================== live streaming session

def test_streaming_session_matches_eager_loop():
    """``StreamingSession`` (live chunk-by-chunk serving) equals an eager
    loop of ``step`` / ``step_invert`` with the same iterated key split;
    encode/decode halves compose to process; reset starts a fresh
    utterance with the same executables."""
    import jax

    from acids_transforms_tpu.serving import StreamingSession

    n_fft, hop, chunk = 512, 128, 1024
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode="pghi"
    )
    x = RNG.standard_normal(4 * chunk).astype(np.float32)
    key = jax.random.PRNGKey(3)

    sess = StreamingSession(
        chain, chunk, inversion_mode="pghi", key=key
    )
    sess.warmup()
    outs = [
        np.asarray(sess.process(jnp.asarray(x[i * chunk: (i + 1) * chunk])))
        for i in range(4)
    ]

    # oracle: the eager reference-style loop, same key discipline
    st = chain.init_state((), mode="pghi")
    k = key
    ref = []
    for i in range(4):
        st, y = chain.step(st, jnp.asarray(x[i * chunk: (i + 1) * chunk]))
        k, sub = jax.random.split(k)
        st, rec = chain.step_invert(
            st, jnp.abs(y), inversion_mode="pghi", key=sub
        )
        ref.append(np.asarray(rec))
    # jit-vs-eager pghi anchor flips bound the match at ~1e-3 rel (the
    # session kernels' documented parity class); key/state errors would
    # show as O(1) differences
    for a, b in zip(outs, ref):
        assert np.abs(a - b).max() / (np.abs(b).max() + 1e-9) < 1e-3

    # encode/decode halves: a decode-only (vocoder) session
    dec = StreamingSession(chain, chunk, inversion_mode="pghi", key=key)
    enc = StreamingSession(chain, chunk, inversion_mode="pghi", key=key)
    outs2 = []
    for i in range(4):
        f = enc.encode(jnp.asarray(x[i * chunk: (i + 1) * chunk]))
        outs2.append(np.asarray(dec.decode(jnp.abs(f))))
    for a, b in zip(outs2, outs):
        np.testing.assert_allclose(a, b, atol=1e-6)  # same jitted path

    # reset: a second utterance reproduces the first
    sess.reset()
    sess._key = key
    again = np.asarray(sess.process(jnp.asarray(x[:chunk])))
    np.testing.assert_allclose(again, outs[0], atol=1e-6)

    # batched session
    xb = RNG.standard_normal((2, 2 * chunk)).astype(np.float32)
    bs = StreamingSession(
        chain, chunk, batch_shape=(2,), inversion_mode="pghi", key=key
    )
    y0 = bs.process(jnp.asarray(xb[:, :chunk]))
    assert y0.shape == (2, chunk)


def test_streaming_session_mesh_multichip():
    """Live multi-chip serving: StreamingSession(mesh=) steps each
    device's local sessions under shard_map — encode matches the
    single-chip session (deterministic), decode stays finite with the
    documented per-shard key-fold draws, and an unbatched session or a
    non-dividing batch fails loudly."""
    import jax

    from acids_transforms_tpu.parallel import make_mesh
    from acids_transforms_tpu.serving import StreamingSession

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = make_mesh({"data": len(jax.devices())})
    n = 2 * len(jax.devices())
    rng = np.random.default_rng(5)
    chain = T.OverlapAdd(512, 128) + T.RealtimeSTFT(
        n_fft=512, hop_length=128, inversion_mode="random"
    )
    s0 = StreamingSession(chain, 1024, batch_shape=(n,),
                          inversion_mode="random")
    sm = StreamingSession(chain, 1024, batch_shape=(n,),
                          inversion_mode="random", mesh=mesh)
    x = jnp.asarray(rng.standard_normal((n, 1024)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((n, 1024)).astype(np.float32))
    f0, fm = s0.encode(x), sm.encode(x)
    np.testing.assert_allclose(
        np.abs(np.asarray(f0)), np.abs(np.asarray(fm)), atol=1e-4
    )
    y1, y2 = sm.decode(jnp.abs(fm)), sm.decode(jnp.abs(sm.encode(x2)))
    assert y1.shape == (n, 1024) and np.isfinite(np.asarray(y2)).all()
    with pytest.raises(ValueError, match="batch"):
        StreamingSession(chain, 1024, inversion_mode="random", mesh=mesh)


def test_compiled_transform_mesh_multichip():
    """CompiledTransform(mesh=): both bucketed directions run under
    shard_map (per-device execution, zero batch-operand collectives in
    the compiled modules).  Forward is bit-equal to the single-chip
    server; deterministic inversion (complex ISTFT) matches to f32
    reduction noise; phaseless inversion draws per shard (key contract)
    and stays finite; batch buckets must divide the mesh."""
    import re

    import jax

    from acids_transforms_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    n = len(jax.devices())
    mesh = make_mesh({"data": n})
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((3, 5000)).astype(np.float32))

    st = T.STFT(n_fft=512, hop_length=128)
    s0 = CompiledTransform(st, buckets=(8192,), batch_sizes=(n,))
    sm = CompiledTransform(st, buckets=(8192,), batch_sizes=(n,), mesh=mesh)
    y0, ym = s0.forward(x), sm.forward(x)
    assert float(jnp.max(jnp.abs(y0 - ym))) == 0.0
    r0, rm = s0.invert(y0), sm.invert(ym)
    assert float(jnp.max(jnp.abs(r0 - rm))) < 1e-5

    ch = (
        T.STFT(n_fft=512, hop_length=128)
        + T.Magnitude(mode="unipolar", mel=False, n_fft=512)
    ).fit(x)
    smm = CompiledTransform(ch, buckets=(8192,), batch_sizes=(n,), mesh=mesh)
    rec = smm.invert(smm.forward(x))
    assert np.isfinite(np.asarray(rec)).all()
    txt = smm._inv.lower(
        smm._frozen, jnp.zeros((n, 40, 257))
    ).compile().as_text()
    assert not re.findall(r"all-gather|all-to-all|collective-permute", txt)
    txt_f = smm._fwd.lower(smm._frozen, jnp.zeros((n, 8192))).compile().as_text()
    assert not re.findall(r"all-gather|all-to-all|collective-permute", txt_f)

    with pytest.raises(ValueError, match="mesh"):
        CompiledTransform(st, batch_sizes=(1, 4), mesh=mesh)
