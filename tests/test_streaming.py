"""Streaming tests: the OverlapAdd + Realtime* chains, unity-gain round
trips, chunked == whole-signal equivalence, scan-compiled sessions."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acids_transforms_tpu import transforms as T
from acids_transforms_tpu.streaming import chunk_signal, scan_roundtrip
from tests.conftest import snr_db


@pytest.fixture(scope="module")
def sig():
    sr = 44100
    t = np.arange(44100) / sr
    x = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate([220, 440, 660]))
    return (0.6 * x / np.abs(x).max()).astype(np.float32)


def _stream_direct(chain, x, chunk, mode=None):
    """Eager per-chunk loop through the chain (reference-style loop)."""
    state = chain.init_state(x.shape[:-1])
    outs = []
    n = x.shape[-1] // chunk
    key = jax.random.PRNGKey(0)
    for i in range(n):
        key, k = jax.random.split(key)
        state, y = chain.step(state, jnp.asarray(x[..., i * chunk: (i + 1) * chunk]))
        state, rec = chain.step_invert(state, y, inversion_mode=mode, key=k)
        outs.append(np.asarray(rec))
    return np.concatenate(outs, axis=-1)


def test_overlap_add_standalone_unity(sig):
    """frame -> OLA round-trip through OverlapAdd is unity-gain in steady state."""
    oadd = T.OverlapAdd(1024, 256)
    chunk = 4096
    out = _stream_direct(oadd, sig, chunk)
    delay = oadd.frames_out * 256  # (overlap-1)*hop streaming latency
    n = out.shape[-1] - delay
    assert snr_db(sig[..., : n - 1024], out[..., delay: delay + n - 1024]) > 100


def test_streaming_stft_chain_unity(sig):
    """OverlapAdd + RealtimeSTFT complex round-trip: unity gain (the
    reference's equivalent chain reconstructs at ~0.75x — fixed here by the
    dual-window synthesis, transforms/stft.py module docs)."""
    chain = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(n_fft=1024, hop_length=256)
    out = _stream_direct(chain, sig, 4096)
    delay = (1024 // 256 - 1) * 256
    n = out.shape[-1] - delay
    s = snr_db(sig[..., : n - 2048], out[..., delay: delay + n - 2048])
    assert s > 60, s


def test_streaming_dgt_chain_unity(sig):
    chain = T.OverlapAdd(1024, 256) + T.RealtimeDGT(n_fft=1024, hop_length=256)
    out = _stream_direct(chain, sig, 4096)
    delay = (1024 // 256 - 1) * 256
    n = out.shape[-1] - delay
    s = snr_db(sig[..., : n - 2048], out[..., delay: delay + n - 2048])
    assert s > 60, s


def test_chunked_equals_wholesignal(sig):
    """Processing in many small chunks == one big chunk (state correctness)."""
    chain = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(n_fft=1024, hop_length=256)
    out_small = _stream_direct(chain, sig[:16384], 2048)
    chain2 = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(n_fft=1024, hop_length=256)
    out_big = _stream_direct(chain2, sig[:16384], 16384)
    np.testing.assert_allclose(out_small, out_big, atol=1e-4)


def test_scan_roundtrip_matches_eager_loop(sig):
    """The jitted lax.scan session must equal the eager per-chunk loop."""
    chain = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(n_fft=1024, hop_length=256)
    x = sig[:16384]
    out_eager = _stream_direct(chain, x, 2048)
    chain2 = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(n_fft=1024, hop_length=256)
    out_scan = np.asarray(scan_roundtrip(chain2, jnp.asarray(x), 2048))
    np.testing.assert_allclose(out_eager, out_scan[..., : out_eager.shape[-1]], atol=1e-4)


def test_streaming_pghi_chunked_equals_full(sig):
    """RT-PGHI with carried (mag, phase, time-step) state: chunked streaming
    phases equal processing all frames in one call, on audible bins."""
    rt = T.RealtimeDGT(n_fft=1024, hop_length=256)
    dgt = T.DGT(n_fft=1024, hop_length=256)
    mag = jnp.abs(dgt.forward(jnp.asarray(sig[:16384])))

    full = np.asarray(rt.pghi_stream(rt.init_state(()), mag, key=jax.random.PRNGKey(1)))

    state = rt.init_state(())
    parts = []
    for i in range(0, mag.shape[0] // 8 * 8, 8):
        blk = mag[i: i + 8]
        phase = np.asarray(rt.pghi_stream(state, blk, key=jax.random.PRNGKey(1)))
        spec = blk * jnp.exp(1j * jnp.asarray(phase))
        state = rt._update_buffers(state, spec)
        parts.append(phase)
    chunked = np.concatenate(parts, axis=0)

    audible = np.asarray(mag[: chunked.shape[0]]) > 1e-2 * float(mag.max())
    # the carried phase buffer is wrapped (angle of the complex spec), so the
    # chunked stream can differ by exact multiples of 2*pi — physically
    # identical; compare on the circle
    d = np.abs(np.angle(np.exp(1j * (full[: chunked.shape[0]] - chunked))))[audible]
    assert d.max() < 1e-2, d.max()


def test_sinebank_streaming_continuity(sig):
    """Sinebank resynthesis carries time_index so sines continue across
    chunks: the boundary between two chunks must not jump."""
    rt = T.RealtimeSTFT(n_fft=1024, hop_length=256, inversion_mode="sinebank")
    mag = jnp.abs(T.STFT(n_fft=1024, hop_length=256).forward(jnp.asarray(sig[:8192])))
    state = rt.init_state(())
    t0 = float(state["time_index"])
    state, y1 = rt.invert_stream(state, mag[:8], inversion_mode="sinebank")
    t1 = float(state["time_index"])
    state, y2 = rt.invert_stream(state, mag[8:16], inversion_mode="sinebank")
    t2 = float(state["time_index"])
    assert t1 == pytest.approx(t0 + 8 * 256 / 44100)
    assert t2 == pytest.approx(t1 + 8 * 256 / 44100)
    assert np.isfinite(np.asarray(y1)).all() and np.isfinite(np.asarray(y2)).all()


def test_chunk_signal_shapes():
    x = jnp.arange(10_000, dtype=jnp.float32).reshape(2, 5000)
    c = chunk_signal(x, 2048)
    assert c.shape == (3, 2, 2048)
    np.testing.assert_allclose(np.asarray(c[0, 0]), np.arange(2048, dtype=np.float32))
    # padded tail
    assert float(c[2, 0, -1]) == 0.0


def test_batched_streaming(test_files):
    sig_b, _ = test_files
    chain = T.OverlapAdd(512, 128) + T.RealtimeSTFT(n_fft=512, hop_length=128)
    x = jnp.asarray(sig_b[..., :8192])  # (3, 2, 8192)
    out = np.asarray(scan_roundtrip(chain, x, 2048))
    assert out.shape[:-1] == x.shape[:-1]
    delay = (512 // 128 - 1) * 128
    n = out.shape[-1] - delay
    assert snr_db(np.asarray(x)[..., : n - 1024], out[..., delay: delay + n - 1024]) > 50


def test_scan_forward_matches_eager(sig):
    from acids_transforms_tpu.streaming import scan_forward

    chain = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(n_fft=1024, hop_length=256)
    x = jnp.asarray(sig[:16384])
    frames_scan, state = scan_forward(chain, x, 4096)
    # eager reference
    chain2 = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(n_fft=1024, hop_length=256)
    st = chain2.init_state(())
    outs = []
    for i in range(0, 16384, 4096):
        st, y = chain2.step(st, x[i: i + 4096])
        outs.append(np.asarray(np.abs(y)))
    ref = np.concatenate(outs, axis=-2)
    assert frames_scan.shape[-2] == ref.shape[-2]
    np.testing.assert_allclose(np.abs(np.asarray(frames_scan)), ref, atol=1e-4)
    # final states agree
    for k in state[0]:
        np.testing.assert_allclose(
            np.asarray(state[0][k]), np.asarray(st[0][k]), atol=1e-5
        )


def _stream_phaseless(mode, sig, n_fft=1024, hop=256, chunk=4096):
    """Chunked loop exercising the *phaseless* path: forward -> |.| -> invert."""
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode=mode
    )
    state = chain.init_state(sig.shape[:-1])
    outs = []
    key = jax.random.PRNGKey(0)
    for i in range(sig.shape[-1] // chunk):
        key, k = jax.random.split(key)
        state, spec = chain.step(state, jnp.asarray(sig[..., i * chunk: (i + 1) * chunk]))
        state, rec = chain.step_invert(state, jnp.abs(spec), inversion_mode=mode, key=k)
        outs.append(np.asarray(rec))
    delay = (n_fft // hop - 1) * hop
    return np.concatenate(outs, axis=-1)[..., delay:]


def test_streaming_pghi_on_realtime_stft(sig):
    """Streaming PGHI on a hann RealtimeSTFT (extension: per-window gamma) —
    the phaseless chain must beat random phase clearly on tonal content."""
    out_pghi = _stream_phaseless("pghi", sig)
    out_rand = _stream_phaseless("random", sig)

    stft_t = T.STFT(n_fft=1024, hop_length=256)
    mag_ref = jnp.abs(stft_t.forward(jnp.asarray(sig)))

    def sc(y):
        m = jnp.abs(stft_t.forward(jnp.asarray(y)))
        n = min(m.shape[-2], mag_ref.shape[-2])
        return float(jnp.linalg.norm(m[:n] - mag_ref[:n]) / jnp.linalg.norm(mag_ref[:n]))

    s_pghi, s_rand = sc(out_pghi), sc(out_rand)
    assert s_pghi < s_rand / 1.5, (s_pghi, s_rand)
    assert s_pghi < 0.4, s_pghi


def test_streaming_pghi_gl_beats_heap_on_noise():
    """VERDICT r1 item 2: streaming phaseless inversion on noise-like content
    must match or beat the *offline exact heap*.  The pinned-context GL
    polish (RealtimeSTFT.pghi_gl_stream) closes the causal scan's gap with
    zero added latency."""
    sr = 44100
    t = np.arange(2 * 32768) / sr
    rng = np.random.default_rng(42)
    env = (np.sin(2 * np.pi * 3.0 * t) ** 2) * np.exp(-t * 1.5)
    perc = (env * rng.standard_normal(t.size)).astype(np.float32)
    x = 0.7 * perc / np.abs(perc).max()

    n_fft, hop = 1024, 256
    delay = (n_fft // hop - 1) * hop
    dgt = T.DGT(n_fft=n_fft, hop_length=hop)
    mag = jnp.abs(dgt.forward(jnp.asarray(x)))

    def sc(rec, d=0):
        rec = np.asarray(rec)[..., d:]
        mr = jnp.abs(dgt.forward(jnp.asarray(rec)))
        n = min(mr.shape[-2], mag.shape[-2])
        return float(
            jnp.linalg.norm(mr[..., :n, :] - mag[..., :n, :])
            / jnp.linalg.norm(mag[..., :n, :])
        )

    sc_heap = sc(dgt.invert(mag, inversion_mode="pghi_exact"))

    def stream(mode):
        rt = T.RealtimeDGT(n_fft=n_fft, hop_length=hop, inversion_mode=mode)
        oadd = T.OverlapAdd(n_fft, hop)
        rt.reset(())
        chunk = 4 * n_fft
        outs = []
        for i in range(x.shape[-1] // chunk):
            seg = jnp.asarray(x[i * chunk: (i + 1) * chunk])
            frames = oadd.forward(seg)
            spec = rt.forward(frames)
            y = rt.invert(jnp.abs(spec), inversion_mode=mode)
            outs.append(np.asarray(oadd.invert(y)))
        return np.concatenate(outs, -1)

    sc_scan = sc(stream("pghi"), delay)
    sc_gl = sc(stream("pghi_gl"), delay)
    assert sc_gl <= sc_heap + 1e-3, (sc_gl, sc_heap)
    assert sc_gl < sc_scan, (sc_gl, sc_scan)


def test_fused_roundtrip_matches_generic(sig):
    """The whole-session fused roundtrip kernel (ops/pallas/stream_step.py)
    is chunk-for-chunk the generic chain scan (bf16x4: <= ~2.5e-5, well
    inside the 1e-4 budget and above the TPU generic path's own bf16x3
    accuracy); unavailable patterns fall back to the generic scan."""
    from acids_transforms_tpu.ops.pallas.stream_step import (
        fused_roundtrip_available,
    )

    x = jnp.asarray(sig[:24576])
    chain = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(n_fft=1024, hop_length=256)
    assert fused_roundtrip_available(chain, 4096)
    y_gen = np.asarray(scan_roundtrip(chain, x, 4096, backend="generic"))
    y_fused = np.asarray(scan_roundtrip(chain, x, 4096, backend="fused"))
    assert y_fused.shape == y_gen.shape
    rel = np.abs(y_gen - y_fused).max() / np.abs(y_gen).max()
    assert rel < 1e-4, rel
    # batched input too
    xb = jnp.stack([x, 0.5 * x])
    yg = np.asarray(scan_roundtrip(chain, xb, 4096, backend="generic"))
    yf = np.asarray(scan_roundtrip(chain, xb, 4096, backend="fused"))
    assert np.abs(yg - yf).max() / np.abs(yg).max() < 1e-4
    # many concurrent streams: the grid-step frame count scales down with
    # batch so per-step VMEM stays bounded (B=32 at T_k=128 OOM'd scoped
    # VMEM on the v5e) — output must stay identical
    xw = jnp.asarray(
        np.stack([sig[:8192] * (1 + 0.01 * i) for i in range(32)])
    )
    yg32 = np.asarray(scan_roundtrip(chain, xw, 4096, backend="generic"))
    yf32 = np.asarray(scan_roundtrip(chain, xw, 4096, backend="fused"))
    assert np.abs(yg32 - yf32).max() / np.abs(yg32).max() < 1e-4
    # lcm-packed layouts (ops/pallas/ola.py): 512/64 (st=1, hop | 128) and
    # 768/192 (st=3 — hop neither a multiple nor a divisor of 128) ride
    # the session kernel too
    for nf, hp, ck in [(512, 64, 2048), (768, 192, 1536)]:
        chain_p = T.OverlapAdd(nf, hp) + T.RealtimeSTFT(n_fft=nf, hop_length=hp)
        assert fused_roundtrip_available(chain_p, ck)
        yg_p = np.asarray(scan_roundtrip(chain_p, xb, ck, backend="generic"))
        yf_p = np.asarray(scan_roundtrip(chain_p, xb, ck, backend="fused"))
        assert yf_p.shape == yg_p.shape
        assert np.abs(yg_p - yf_p).max() / np.abs(yg_p).max() < 1e-4, (nf, hp)
    # gates: phaseless modes, mismatched params, non-divisor chunks decline
    assert not fused_roundtrip_available(
        T.OverlapAdd(1024, 256) + T.RealtimeSTFT(n_fft=512, hop_length=128), 4096
    )
    assert not fused_roundtrip_available(chain, 4000)
    assert not fused_roundtrip_available(
        T.ComposeAudioTransform([T.RealtimeSTFT()]), 4096
    )


def test_scan_roundtrip_phaseless_takes_magnitude(sig):
    """With inversion_mode set, scan_roundtrip drops the phase before
    inversion (the reference loop's ``invert(spec.abs(), mode)``) — a
    phaseless roundtrip must NOT be a bit-exact reconstruction."""
    x = jnp.asarray(sig[:16384])
    chain = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(
        n_fft=1024, hop_length=256, inversion_mode="random"
    )
    y_direct = np.asarray(scan_roundtrip(chain, x, 4096))
    y_random = np.asarray(scan_roundtrip(chain, x, 4096, inversion_mode="random"))
    delay = 3 * 256
    a = np.asarray(x)[: 16384 - delay - 2048]
    d_direct = np.abs(y_direct[delay: 16384 - 2048] - a).max()
    d_random = np.abs(y_random[delay: 16384 - 2048] - a).max()
    assert d_direct < 1e-3          # direct: near-exact
    assert d_random > 10 * d_direct  # phaseless: genuinely phaseless


def test_streaming_pghi_gl_bounded_lookahead():
    """VERDICT r2 #9: ``lookahead_frames=k`` delays commit by k frames so the
    GL polish sees the ridge continuation.  On the noise-burst corpus the
    streamed SC reaches <= 0.13 (offline pghi_gl: ~0.092; r2's zero-lookahead
    16-iteration stream: 0.161) at exactly ``k * hop`` samples added latency,
    and lookahead measurably beats the same iteration budget without it."""
    sr = 44100
    t = np.arange(2 * 32768) / sr
    rng = np.random.default_rng(42)
    env = (np.sin(2 * np.pi * 3.0 * t) ** 2) * np.exp(-t * 1.5)
    perc = (env * rng.standard_normal(t.size)).astype(np.float32)
    x = 0.7 * perc / np.abs(perc).max()

    n_fft, hop = 1024, 256
    delay = (n_fft // hop - 1) * hop
    dgt = T.DGT(n_fft=n_fft, hop_length=hop)
    mag = jnp.abs(dgt.forward(jnp.asarray(x)))

    def sc(rec, d):
        rec = np.asarray(rec)[..., d:]
        mr = jnp.abs(dgt.forward(jnp.asarray(rec)))
        n = min(mr.shape[-2], mag.shape[-2])
        return float(
            jnp.linalg.norm(mr[..., :n, :] - mag[..., :n, :])
            / jnp.linalg.norm(mag[..., :n, :])
        )

    def stream(la, gl_it):
        rt = T.RealtimeDGT(
            n_fft=n_fft, hop_length=hop, inversion_mode="pghi_gl",
            lookahead_frames=la, gl_iterations=gl_it,
        )
        oadd = T.OverlapAdd(n_fft, hop)
        rt.reset(())
        chunk = 4 * n_fft
        outs = []
        for i in range(x.shape[-1] // chunk):
            seg = jnp.asarray(x[i * chunk: (i + 1) * chunk])
            frames = oadd.forward(seg)
            spec = rt.forward(frames)
            y = rt.invert(jnp.abs(spec), inversion_mode="pghi_gl")
            outs.append(np.asarray(oadd.invert(y)))
        return np.concatenate(outs, -1)

    sc_la = sc(stream(4, 64), delay + 4 * hop)
    assert sc_la <= 0.13, sc_la
    sc_no_la = sc(stream(0, 64), delay)
    assert sc_la <= sc_no_la - 0.003, (sc_la, sc_no_la)


def test_streaming_pghi_gl_scan_compiled(sig):
    """pghi_gl streams under one compiled lax.scan session (state pytree with
    the pinned-context buffers rides the scan carry)."""
    chain = T.OverlapAdd(512, 128) + T.RealtimeDGT(n_fft=512, hop_length=128)
    mag_chain_out = scan_roundtrip(chain, sig, chunk_size=2048, inversion_mode="pghi_gl")
    assert np.isfinite(np.asarray(mag_chain_out)).all()


def test_scan_roundtrip_backend_contracts(sig):
    """r3 review fixes: unknown backend strings raise (a typo would
    silently measure the generic scan), and explicit backend='fused' runs
    above the auto batch crossover (the cap is a perf heuristic, not an
    availability limit)."""
    x = jnp.asarray(sig[:8192])
    chain = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(n_fft=1024, hop_length=256)
    with pytest.raises(ValueError, match="unknown scan_roundtrip backend"):
        scan_roundtrip(chain, x, 4096, backend="pallas")
    xb = jnp.broadcast_to(x, (66, x.shape[-1]))  # above the 64 auto cap
    y_f = np.asarray(scan_roundtrip(chain, xb, 4096, backend="fused"))
    y_g = np.asarray(scan_roundtrip(chain, xb, 4096, backend="generic"))
    assert y_f.shape == y_g.shape
    assert np.abs(y_f - y_g).max() / np.abs(y_g).max() < 1e-4


@pytest.mark.parametrize(
    "n_fft,hop,chunk",
    [
        (1024, 256, 4096),   # the bench shape
        (512, 128, 2048),    # smaller, overlap 4
        (512, 64, 2048),     # lcm-packed OLA (st=1)
        (768, 192, 1536),    # lcm-packed OLA (st=3)
    ],
)
def test_fused_pghi_session_matches_generic(sig, n_fft, hop, chunk):
    """The whole-session phaseless (RT-PGHI) kernel equals the generic
    chain scan — same per-chunk thresholds, backward-stencil gradients,
    anchored fill, and bit-equal silent-bin random draws (the wrapper
    replicates scan_roundtrip's key pipeline)."""
    from acids_transforms_tpu.ops.pallas.stream_step import (
        fused_pghi_roundtrip_available,
        make_fused_pghi_roundtrip,
    )

    x = jnp.asarray(sig[: 4 * chunk])
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode="pghi"
    )
    assert fused_pghi_roundtrip_available(chain, chunk)
    key = jax.random.PRNGKey(11)
    y_gen = np.asarray(
        scan_roundtrip(
            chain, x, chunk, inversion_mode="pghi", key=key,
            backend="generic",
        )
    )
    y_ker = np.asarray(make_fused_pghi_roundtrip(chain, chunk, key=key)(x))
    assert y_ker.shape == y_gen.shape
    rel = np.abs(y_ker - y_gen).max() / (np.abs(y_gen).max() + 1e-9)
    assert rel < 1e-3, (n_fft, hop, rel)
    # batched input too
    xb = jnp.stack([x, 0.5 * x])
    yg = np.asarray(
        scan_roundtrip(
            chain, xb, chunk, inversion_mode="pghi", key=key,
            backend="generic",
        )
    )
    yk = np.asarray(make_fused_pghi_roundtrip(chain, chunk, key=key)(xb))
    assert np.abs(yk - yg).max() / (np.abs(yg).max() + 1e-9) < 1e-3


def test_fused_pghi_session_gates(sig):
    """Availability: phaseless kernel needs integer overlap, OLA support,
    a chunk whose frame count matches the tile unit; other phaseless modes
    and mid-chain processing keep the generic scan; explicit
    backend='fused' with mode='pghi' dispatches the phaseless kernel."""
    from acids_transforms_tpu.ops.pallas.stream_step import (
        fused_pghi_roundtrip_available,
    )

    ch = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(
        n_fft=1024, hop_length=256, inversion_mode="pghi"
    )
    assert fused_pghi_roundtrip_available(ch, 4096)
    # overlap beyond the window halo -> unavailable (shared layout gate)
    ch_deep = T.OverlapAdd(1024, 64) + T.RealtimeSTFT(
        n_fft=1024, hop_length=64
    )
    assert not fused_pghi_roundtrip_available(ch_deep, 4096)
    # chunk frame count not a tile-unit multiple -> unavailable
    assert not fused_pghi_roundtrip_available(ch, 256 * 12)
    # dispatch: backend='fused' + mode='pghi' runs the kernel (interpret
    # here) and matches generic
    x = jnp.asarray(sig[:8192])
    key = jax.random.PRNGKey(3)
    y_f = np.asarray(
        scan_roundtrip(ch, x, 4096, inversion_mode="pghi", key=key,
                       backend="fused")
    )
    y_g = np.asarray(
        scan_roundtrip(ch, x, 4096, inversion_mode="pghi", key=key,
                       backend="generic")
    )
    assert np.abs(y_f - y_g).max() / (np.abs(y_g).max() + 1e-9) < 1e-3
    # a call without ANY fused session path still rejects explicit 'fused'
    # (random gained its kernel in r3.22, sinebank its closed form in
    # r3.28 — but an unrecognized chain layout has neither)
    bare = T.RealtimeSTFT(n_fft=1024, hop_length=256, inversion_mode="pghi")
    with pytest.raises(ValueError, match="fused"):
        scan_roundtrip(bare, x, 4096, inversion_mode="pghi", key=key,
                       backend="fused")
    # ... and a sinebank chunk that is not a hop multiple keeps the
    # closed form unavailable (frame times would drift vs the scan)
    with pytest.raises(ValueError, match="fused"):
        scan_roundtrip(ch, x, 4000, inversion_mode="sinebank",
                       backend="fused")


@pytest.mark.parametrize("n_fft,hop,chunk,iters", [(1024, 256, 4096, 4), (512, 128, 2048, 4)])
def test_fused_pghi_gl_session_matches_generic(sig, n_fft, hop, chunk, iters):
    """The fused ``pghi_gl`` session (RT-PGHI seed + pinned-context GL
    polish in one kernel) equals the generic chain scan."""
    from acids_transforms_tpu.ops.pallas.stream_step import (
        fused_pghi_gl_roundtrip_available,
        make_fused_pghi_gl_roundtrip,
    )

    x = jnp.asarray(sig[: 4 * chunk])
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode="pghi_gl",
        gl_iterations=iters,
    )
    assert fused_pghi_gl_roundtrip_available(chain, chunk)
    key = jax.random.PRNGKey(13)
    y_gen = np.asarray(
        scan_roundtrip(
            chain, x, chunk, inversion_mode="pghi_gl", key=key,
            backend="generic",
        )
    )
    y_ker = np.asarray(make_fused_pghi_gl_roundtrip(chain, chunk, key=key)(x))
    assert y_ker.shape == y_gen.shape
    rel = np.abs(y_ker - y_gen).max() / (np.abs(y_gen).max() + 1e-9)
    assert rel < 1e-3, (n_fft, hop, rel)
    # batched
    xb = jnp.stack([x, 0.5 * x])
    yg = np.asarray(
        scan_roundtrip(
            chain, xb, chunk, inversion_mode="pghi_gl", key=key,
            backend="generic",
        )
    )
    yk = np.asarray(make_fused_pghi_gl_roundtrip(chain, chunk, key=key)(xb))
    assert np.abs(yk - yg).max() / (np.abs(yg).max() + 1e-9) < 1e-3
    # gates: lookahead > chunk frames and lcm-packed (non-aligned) hops
    # keep the generic scan; dispatch via backend='fused' matches too
    la_chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode="pghi_gl",
        lookahead_frames=chunk // hop + 1,
    )
    assert not fused_pghi_gl_roundtrip_available(la_chain, chunk)
    packed = T.OverlapAdd(512, 64) + T.RealtimeSTFT(
        n_fft=512, hop_length=64, inversion_mode="pghi_gl"
    )
    assert not fused_pghi_gl_roundtrip_available(packed, 2048)
    y_d = np.asarray(
        scan_roundtrip(
            chain, x, chunk, inversion_mode="pghi_gl", key=key,
            backend="fused",
        )
    )
    assert np.abs(y_d - y_gen).max() / (np.abs(y_gen).max() + 1e-9) < 1e-3


@pytest.mark.parametrize("la", [2, 5])
def test_fused_pghi_gl_session_lookahead_matches_generic(sig, la):
    """Bounded-lookahead ``pghi_gl`` sessions ride the fused kernel too
    (VERDICT r2 #9 follow-through): commit delayed by ``lookahead_frames``,
    pending magnitudes carried in VMEM, output equal to the generic scan's
    ``la_mag`` shuffle.  la=5 exercises a non-8-aligned fill row count
    (T_c + la = 21 at the 1024/256 chunk 4096 shape)."""
    from acids_transforms_tpu.ops.pallas.stream_step import (
        fused_pghi_gl_roundtrip_available,
        make_fused_pghi_gl_roundtrip,
    )

    n_fft, hop, chunk = 1024, 256, 4096
    x = jnp.asarray(sig[: 4 * chunk])
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode="pghi_gl",
        gl_iterations=4, lookahead_frames=la,
    )
    assert fused_pghi_gl_roundtrip_available(chain, chunk)
    key = jax.random.PRNGKey(13)
    y_gen = np.asarray(
        scan_roundtrip(
            chain, x, chunk, inversion_mode="pghi_gl", key=key,
            backend="generic",
        )
    )
    y_ker = np.asarray(make_fused_pghi_gl_roundtrip(chain, chunk, key=key)(x))
    assert y_ker.shape == y_gen.shape
    rel = np.abs(y_ker - y_gen).max() / (np.abs(y_gen).max() + 1e-9)
    assert rel < 1e-3, (la, rel)
    # the lookahead delay is visible: output is NOT the la=0 session
    base = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode="pghi_gl",
        gl_iterations=4,
    )
    y0 = np.asarray(
        scan_roundtrip(
            base, x, chunk, inversion_mode="pghi_gl", key=key,
            backend="generic",
        )
    )
    assert np.abs(y_ker - y0).max() / (np.abs(y0).max() + 1e-9) > 1e-3
    # batched
    xb = jnp.stack([x, 0.5 * x])
    yg = np.asarray(
        scan_roundtrip(
            chain, xb, chunk, inversion_mode="pghi_gl", key=key,
            backend="generic",
        )
    )
    yk = np.asarray(make_fused_pghi_gl_roundtrip(chain, chunk, key=key)(xb))
    assert np.abs(yk - yg).max() / (np.abs(yg).max() + 1e-9) < 1e-3


def test_run_batch_slabs_unit():
    """``_run_batch_slabs`` splits the leading axis into <= slab pieces,
    calls per piece, and concatenates — exact by construction; B <= slab
    makes exactly one call."""
    from acids_transforms_tpu.ops.pallas.stream_step import _run_batch_slabs

    seen = []

    def call(a, b):
        seen.append(int(a.shape[0]))
        return a + b

    a = jnp.arange(20.0).reshape(10, 2)
    out = _run_batch_slabs(call, 10, 4, a, 2.0 * a)
    assert np.allclose(np.asarray(out), np.asarray(3.0 * a))
    assert seen == [4, 4, 2]
    seen.clear()
    _run_batch_slabs(call, 3, 4, a[:3], 2.0 * a[:3])
    assert seen == [3]


def test_fused_pghi_session_batch_slabs(sig, monkeypatch):
    """Forcing a tiny batch slab reproduces the unsplit phaseless session
    kernel bit-for-bit: streams are independent (all carried state and the
    per-chunk threshold are per-stream), so the wrapper's VMEM-bounding
    batch split is exact at any B."""
    from acids_transforms_tpu.ops.pallas import stream_step as ss

    x = jnp.asarray(
        np.stack([sig[512 * i: 512 * i + 2048] for i in range(12)])
    )
    chain = T.OverlapAdd(512, 128) + T.RealtimeSTFT(
        n_fft=512, hop_length=128, inversion_mode="pghi"
    )
    key = jax.random.PRNGKey(7)
    full = np.asarray(ss.make_fused_pghi_roundtrip(chain, 1024, key=key)(x))
    monkeypatch.setattr(ss, "_pghi_session_slab", lambda *a, **k: 8)
    split = np.asarray(ss.make_fused_pghi_roundtrip(chain, 1024, key=key)(x))
    assert np.array_equal(full, split)


@pytest.mark.parametrize(
    "n_fft,hop,chunk",
    [
        (1024, 256, 4096),   # the bench shape
        (512, 64, 2048),     # lcm-packed OLA (st=1)
    ],
)
def test_fused_random_session_matches_generic(sig, n_fft, hop, chunk):
    """The whole-session random-phase kernel (the reference's DEFAULT
    realtime mode, stft.py:241-243) equals the generic chain scan
    sample-level in interpret mode: the uniform draws replicate
    scan_roundtrip's key pipeline bit-exactly and there are no
    threshold decisions to flip."""
    from acids_transforms_tpu.ops.pallas.stream_step import (
        fused_random_roundtrip_available,
        make_fused_random_roundtrip,
    )

    x = jnp.asarray(sig[: 3 * chunk + 100])  # ragged tail: chunk pad path
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode="random"
    )
    assert fused_random_roundtrip_available(chain, chunk)
    key = jax.random.PRNGKey(13)
    y_gen = np.asarray(
        scan_roundtrip(
            chain, x, chunk, inversion_mode="random", key=key,
            backend="generic",
        )
    )
    y_ker = np.asarray(make_fused_random_roundtrip(chain, chunk, key=key)(x))
    assert y_ker.shape == y_gen.shape
    rel = np.abs(y_ker - y_gen).max() / (np.abs(y_gen).max() + 1e-9)
    assert rel < 1e-3, (n_fft, hop, rel)
    # batched input: per-stream draws differ (batch is inside the draw
    # shape), so parity per stream checks the angle layout end to end
    xb = jnp.stack([x, 0.5 * x])
    yg = np.asarray(
        scan_roundtrip(
            chain, xb, chunk, inversion_mode="random", key=key,
            backend="generic",
        )
    )
    yk = np.asarray(make_fused_random_roundtrip(chain, chunk, key=key)(xb))
    assert np.abs(yk - yg).max() / (np.abs(yg).max() + 1e-9) < 1e-3


def test_fused_random_session_fused_backend_dispatch(sig):
    """backend='fused' routes mode='random' through the session kernel
    (no loud unavailability error), and an unrecognized chain still
    raises."""
    x = jnp.asarray(sig[:4096])
    chain = T.OverlapAdd(512, 128) + T.RealtimeSTFT(
        n_fft=512, hop_length=128, inversion_mode="random"
    )
    key = jax.random.PRNGKey(3)
    y_f = scan_roundtrip(
        chain, x, 1024, inversion_mode="random", key=key, backend="fused"
    )
    y_g = scan_roundtrip(
        chain, x, 1024, inversion_mode="random", key=key, backend="generic"
    )
    assert np.abs(np.asarray(y_f) - np.asarray(y_g)).max() / (
        np.abs(np.asarray(y_g)).max() + 1e-9
    ) < 1e-3
    with pytest.raises(ValueError, match="fused"):
        scan_roundtrip(
            chain, x, 1000,  # not a hop multiple
            inversion_mode="random", key=key, backend="fused",
        )


# ===================================================== invert-only (decode)

def test_scan_invert_equals_roundtrip(sig):
    """``scan_invert`` on the forward's magnitudes, with the same key,
    reproduces ``scan_roundtrip`` EXACTLY — the decode API is the invert
    half of the roundtrip scan (same state threading, same per-chunk key
    pipeline)."""
    from acids_transforms_tpu.streaming import scan_forward, scan_invert

    n_fft, hop, chunk = 1024, 256, 4096
    x = jnp.asarray(sig[: 3 * chunk])
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode="pghi"
    )
    key = jax.random.PRNGKey(5)
    frames, _ = scan_forward(chain, x, chunk)
    mags = jnp.abs(frames)
    y_rt = np.asarray(
        scan_roundtrip(
            chain, x, chunk, inversion_mode="pghi", key=key,
            backend="generic",
        )
    )
    y_inv = np.asarray(
        scan_invert(
            chain, mags, chunk // hop, inversion_mode="pghi", key=key,
            backend="generic",
        )
    )
    assert y_inv.shape == y_rt.shape
    np.testing.assert_array_equal(y_inv, y_rt)
    # complex (direct) decode: exact unity-gain reconstruction too
    y_c = np.asarray(
        scan_invert(chain, frames, chunk // hop, backend="generic")
    )
    y_crt = np.asarray(scan_roundtrip(chain, x, chunk, backend="generic"))
    np.testing.assert_allclose(y_c, y_crt, atol=1e-5)
    # ragged frame count: zero-frame padded, output trimmed to T * hop
    y_rag = np.asarray(
        scan_invert(
            chain, mags[:-3], chunk // hop, inversion_mode="pghi", key=key,
            backend="generic",
        )
    )
    assert y_rag.shape[-1] == (mags.shape[-2] - 3) * hop


@pytest.mark.parametrize("mode,kw", [
    ("pghi", {}),
    ("pghi_gl", {"gl_iterations": 4}),
    ("pghi_gl", {"gl_iterations": 4, "lookahead_frames": 2}),
    ("random", {}),
])
def test_fused_invert_session_matches_generic(sig, mode, kw):
    """The decode (invert-only) session kernels equal the generic
    ``scan_invert`` scan — same fills/draws minus the analysis GEMM
    (magnitudes arrive bit-identical in both paths)."""
    from acids_transforms_tpu.streaming import scan_forward, scan_invert
    from acids_transforms_tpu.ops.pallas import stream_step as ss

    n_fft, hop, chunk = 1024, 256, 4096
    T_c = chunk // hop
    x = jnp.asarray(sig[: 3 * chunk])
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode=mode, **kw
    )
    frames, _ = scan_forward(chain, x, chunk)
    mags = jnp.abs(frames)
    gate = getattr(ss, f"fused_{mode}_invert_available")
    maker = getattr(ss, f"make_fused_{mode}_invert")
    assert gate(chain, T_c)
    key = jax.random.PRNGKey(9)
    y_gen = np.asarray(
        scan_invert(
            chain, mags, T_c, inversion_mode=mode, key=key,
            backend="generic",
        )
    )
    y_ker = np.asarray(maker(chain, T_c, key=key)(mags))
    assert y_ker.shape == y_gen.shape
    rel = np.abs(y_ker - y_gen).max() / (np.abs(y_gen).max() + 1e-9)
    assert rel < 1e-3, (mode, kw, rel)
    # batched + backend='fused' dispatch through scan_invert
    mb = jnp.stack([mags, 0.5 * mags])
    yg = np.asarray(
        scan_invert(
            chain, mb, T_c, inversion_mode=mode, key=key, backend="generic"
        )
    )
    yk = np.asarray(
        scan_invert(
            chain, mb, T_c, inversion_mode=mode, key=key, backend="fused"
        )
    )
    assert np.abs(yk - yg).max() / (np.abs(yg).max() + 1e-9) < 1e-3


def test_fused_invert_session_gates():
    """Decode-session availability mirrors the roundtrip gates; explicit
    backend='fused' fails loudly off-region."""
    from acids_transforms_tpu.streaming import scan_invert
    from acids_transforms_tpu.ops.pallas.stream_step import (
        fused_pghi_gl_invert_available,
        fused_pghi_invert_available,
    )

    chain = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(
        n_fft=1024, hop_length=256, inversion_mode="pghi"
    )
    assert fused_pghi_invert_available(chain, 16)
    # a bare transform (no OverlapAdd) is not a recognized session
    assert not fused_pghi_invert_available(
        T.RealtimeSTFT(n_fft=1024, hop_length=256), 16
    )
    # pghi_gl lookahead > chunk frames keeps the generic scan
    la_chain = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(
        n_fft=1024, hop_length=256, inversion_mode="pghi_gl",
        lookahead_frames=17,
    )
    assert not fused_pghi_gl_invert_available(la_chain, 16)
    mags = jnp.ones((40, 513), jnp.float32)
    with pytest.raises(ValueError, match="fused"):
        scan_invert(
            la_chain, mags, 16, inversion_mode="pghi_gl",
            key=jax.random.PRNGKey(0), backend="fused",
        )


# ===================================================== encode-only sessions

def test_fused_forward_session_matches_generic(sig):
    """The ENCODE session kernel (audio -> complex frames) equals the
    generic ``scan_forward`` scan, including the closed-form final state
    (ring = padded signal tail); backend='fused' dispatch and the
    stateful-resume contract (continue with the returned state on the
    generic path) hold."""
    from acids_transforms_tpu.streaming import scan_forward
    from acids_transforms_tpu.ops.pallas.stream_step import (
        fused_forward_session_available,
        make_fused_forward_session,
    )

    n_fft, hop, chunk = 1024, 256, 4096
    x = jnp.asarray(sig[: 3 * chunk + 1000])  # ragged tail too
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop
    )
    assert fused_forward_session_available(chain, chunk)
    ys_g, st_g = scan_forward(chain, x, chunk, backend="generic")
    ys_f, st_f = make_fused_forward_session(chain, chunk)(x)
    assert ys_f.shape == ys_g.shape and ys_f.dtype == ys_g.dtype
    rel = np.abs(np.asarray(ys_f - ys_g)).max() / (
        np.abs(np.asarray(ys_g)).max() + 1e-9
    )
    assert rel < 1e-3, rel
    # final state identical (the forward only moves the framing ring)
    fl_g, td_g = jax.tree_util.tree_flatten(st_g)
    fl_f, td_f = jax.tree_util.tree_flatten(st_f)
    assert td_g == td_f
    for a, b in zip(fl_g, fl_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # batched + dispatch through scan_forward(backend='fused')
    xb = jnp.stack([x, 0.5 * x])
    yb_g, _ = scan_forward(chain, xb, chunk, backend="generic")
    yb_f, _ = scan_forward(chain, xb, chunk, backend="fused")
    assert np.abs(np.asarray(yb_f - yb_g)).max() / (
        np.abs(np.asarray(yb_g)).max() + 1e-9
    ) < 1e-3
    # explicit-state sessions keep the generic scan; fused fails loudly
    st0 = chain.init_state(x.shape[:-1])
    with pytest.raises(ValueError, match="fused"):
        scan_forward(chain, x, chunk, state=st0, backend="fused")
    # resume contract: feed the fused session's final state to the
    # generic scan for a second segment == one long generic session
    x2 = jnp.asarray(sig[3 * chunk + 1000: 5 * chunk + 1000])
    y2_f, _ = scan_forward(chain, x2, chunk, state=st_f, backend="generic")
    y2_g, _ = scan_forward(chain, x2, chunk, state=st_g, backend="generic")
    np.testing.assert_allclose(
        np.asarray(y2_f), np.asarray(y2_g), atol=1e-5
    )


# ============================================== feature (3-chain) sessions

def test_feature_chain_sessions_match_generic(sig):
    """``[OverlapAdd, RealtimeSTFT, Magnitude]`` chains ride the session
    kernels in all three APIs: Magnitude is stateless and frame-local, so
    the fused paths apply it whole-session in XLA around the kernels —
    encode (scan_forward), decode (scan_invert, with the 3-chain key
    split), and the composed phaseless roundtrip (scan_roundtrip)."""
    from acids_transforms_tpu.streaming import (
        scan_forward,
        scan_invert,
        scan_roundtrip,
    )

    n_fft, hop, chunk = 1024, 256, 4096
    T_c = chunk // hop
    x = jnp.asarray(sig[: 3 * chunk])
    chain = (
        T.OverlapAdd(n_fft, hop)
        + T.RealtimeSTFT(n_fft=n_fft, hop_length=hop, inversion_mode="pghi")
        + T.Magnitude(mode=None, contrast="log1p", mel=True, n_fft=n_fft)
    )
    key = jax.random.PRNGKey(21)

    # encode: fused == generic (features), final state structure equal
    f_g, st_g = scan_forward(chain, x, chunk, backend="generic")
    f_f, st_f = scan_forward(chain, x, chunk, backend="fused")
    assert f_f.shape == f_g.shape
    rel = np.abs(np.asarray(f_f - f_g)).max() / (
        np.abs(np.asarray(f_g)).max() + 1e-9
    )
    assert rel < 1e-3, rel
    assert jax.tree_util.tree_structure(st_f) == jax.tree_util.tree_structure(
        st_g
    )

    # decode: features -> audio, fused == generic (3-chain key split)
    y_g = np.asarray(
        scan_invert(
            chain, f_g, T_c, inversion_mode="pghi", key=key,
            backend="generic",
        )
    )
    y_f = np.asarray(
        scan_invert(
            chain, f_g, T_c, inversion_mode="pghi", key=key, backend="fused"
        )
    )
    assert y_f.shape == y_g.shape
    rel = np.abs(y_f - y_g).max() / (np.abs(y_g).max() + 1e-9)
    assert rel < 1e-3, rel

    # roundtrip: encode kernel + mel roundtrip + decode kernel == generic
    r_g = np.asarray(
        scan_roundtrip(
            chain, x, chunk, inversion_mode="pghi", key=key,
            backend="generic",
        )
    )
    r_f = np.asarray(
        scan_roundtrip(
            chain, x, chunk, inversion_mode="pghi", key=key, backend="fused"
        )
    )
    assert r_f.shape == r_g.shape
    rel = np.abs(r_f - r_g).max() / (np.abs(r_g).max() + 1e-9)
    assert rel < 1e-3, rel

    # a 3-chain whose tail is NOT a Magnitude keeps the generic scan
    other = (
        T.OverlapAdd(n_fft, hop)
        + T.RealtimeSTFT(n_fft=n_fft, hop_length=hop)
        + T.Unsqueeze(dim=-1)
    )
    with pytest.raises(ValueError, match="fused"):
        scan_forward(other, x, chunk, backend="fused")


def test_fused_complex_invert_matches_generic(sig):
    """Complex (explicit-phase) decode rides the synthesis+OLA kernel:
    ``scan_invert(chain, spec, T_c)`` fused == generic, including the
    roundtrip identity (spec from the forward reconstructs the input at
    unity gain after the group delay)."""
    from acids_transforms_tpu.streaming import scan_forward, scan_invert
    from acids_transforms_tpu.ops.pallas.stream_step import (
        fused_complex_invert_available,
    )

    n_fft, hop, chunk = 1024, 256, 4096
    T_c = chunk // hop
    x = jnp.asarray(sig[: 3 * chunk])
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop
    )
    assert fused_complex_invert_available(chain, T_c)
    spec, _ = scan_forward(chain, x, chunk, backend="generic")
    y_g = np.asarray(scan_invert(chain, spec, T_c, backend="generic"))
    y_f = np.asarray(scan_invert(chain, spec, T_c, backend="fused"))
    assert y_f.shape == y_g.shape
    rel = np.abs(y_f - y_g).max() / (np.abs(y_g).max() + 1e-9)
    assert rel < 1e-3, rel
    # unity-gain reconstruction after the (overlap-1)*hop group delay
    delay = (n_fft // hop - 1) * hop
    assert (
        snr_db(np.asarray(x)[: -delay or None], y_f[delay:]) > 55
    )
    # batched
    sb = jnp.stack([spec, 0.5 * spec])
    yb_g = np.asarray(scan_invert(chain, sb, T_c, backend="generic"))
    yb_f = np.asarray(scan_invert(chain, sb, T_c, backend="fused"))
    assert np.abs(yb_f - yb_g).max() / (np.abs(yb_g).max() + 1e-9) < 1e-3


def test_sinebank_session_closed_form_matches_generic(sig):
    """``inversion_mode="sinebank"`` sessions take a scan-free closed form
    (``streaming._sinebank_session``): the carried oscillator state is
    deterministic, so decode and roundtrip collapse to two session-sized
    GEMMs + one offline OLA.  Parity with the generic scan is bounded by
    single-ulp oscillator-angle jitter (XLA fuses the phase expression
    differently across program contexts — the scan is not even bit-stable
    against an eager loop of its own body), measured 2-6e-4 relative L2."""
    from acids_transforms_tpu.streaming import scan_invert, scan_roundtrip

    # this test compiles ~11 session-sized programs at the tail of an
    # already compile-heavy module — clear first so the process stays
    # under the vm.max_map_count LLVM-JIT mmap ceiling (see conftest)
    jax.clear_caches()

    n_fft, hop, chunk = 1024, 256, 4096
    T_c = chunk // hop
    x = jnp.asarray(sig[: 3 * chunk])
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode="sinebank"
    )

    # decode: magnitudes -> audio, closed form == generic scan
    rng = np.random.default_rng(3)
    mag = jnp.asarray(rng.random((40, n_fft // 2 + 1), dtype=np.float32))
    y_g = np.asarray(
        scan_invert(chain, mag, T_c, inversion_mode="sinebank",
                    backend="generic")
    )
    for be in ("auto", "fused"):
        y_c = np.asarray(
            scan_invert(chain, mag, T_c, inversion_mode="sinebank",
                        backend=be)
        )
        assert y_c.shape == y_g.shape
        rel = np.linalg.norm(y_c - y_g) / (np.linalg.norm(y_g) + 1e-9)
        assert rel < 5e-3, (be, rel)

    # batched decode, non-chunk-multiple frame count (padded tail)
    magb = jnp.asarray(rng.random((2, 21, n_fft // 2 + 1), dtype=np.float32))
    yb_g = np.asarray(
        scan_invert(chain, magb, T_c, inversion_mode="sinebank",
                    backend="generic")
    )
    yb_c = np.asarray(
        scan_invert(chain, magb, T_c, inversion_mode="sinebank",
                    backend="auto")
    )
    assert yb_c.shape == yb_g.shape
    rel = np.linalg.norm(yb_c - yb_g) / (np.linalg.norm(yb_g) + 1e-9)
    assert rel < 5e-3, rel

    # roundtrip: 2-chain (|spec| -> sinebank) and feature 3-chain
    # (mel roundtrip -> sinebank), closed form == generic
    r_g = np.asarray(
        scan_roundtrip(chain, x, chunk, inversion_mode="sinebank",
                       backend="generic")
    )
    r_c = np.asarray(
        scan_roundtrip(chain, x, chunk, inversion_mode="sinebank",
                       backend="auto")
    )
    assert r_c.shape == r_g.shape
    rel = np.linalg.norm(r_c - r_g) / (np.linalg.norm(r_g) + 1e-9)
    assert rel < 5e-3, rel

    feat = chain + T.Magnitude(
        mode=None, contrast="log1p", mel=True, n_fft=n_fft
    )
    f_g = np.asarray(
        scan_roundtrip(feat, x, chunk, inversion_mode="sinebank",
                       backend="generic")
    )
    f_c = np.asarray(
        scan_roundtrip(feat, x, chunk, inversion_mode="sinebank",
                       backend="auto")
    )
    assert f_c.shape == f_g.shape
    rel = np.linalg.norm(f_c - f_g) / (np.linalg.norm(f_g) + 1e-9)
    assert rel < 5e-3, rel

    # the DGT variant rides the same closed form (dual gaussian synthesis)
    dchain = T.OverlapAdd(n_fft, hop) + T.RealtimeDGT(
        n_fft=n_fft, hop_length=hop, inversion_mode="sinebank"
    )
    m2 = jnp.asarray(rng.random((24, n_fft // 2 + 1), dtype=np.float32))
    d_g = np.asarray(
        scan_invert(dchain, m2, T_c, inversion_mode="sinebank",
                    backend="generic")
    )
    d_c = np.asarray(
        scan_invert(dchain, m2, T_c, inversion_mode="sinebank",
                    backend="auto")
    )
    rel = np.linalg.norm(d_c - d_g) / (np.linalg.norm(d_g) + 1e-9)
    assert rel < 5e-3, rel

    # 3-chain feature DECODE through scan_invert (the mag_t.invert branch
    # at streaming.py's sinebank dispatch): closed form == generic
    from acids_transforms_tpu.streaming import scan_forward

    feats, _ = scan_forward(feat, x, chunk, backend="generic")
    fi_g = np.asarray(
        scan_invert(feat, feats, T_c, inversion_mode="sinebank",
                    backend="generic")
    )
    for be in ("auto", "fused"):
        fi_c = np.asarray(
            scan_invert(feat, feats, T_c, inversion_mode="sinebank",
                        backend=be)
        )
        assert fi_c.shape == fi_g.shape
        rel = np.linalg.norm(fi_c - fi_g) / (np.linalg.norm(fi_g) + 1e-9)
        assert rel < 5e-3, (be, rel)


def test_sinebank_layout_mismatch_falls_back_to_generic():
    """A chain whose OverlapAdd disagrees with the RealtimeSTFT on
    (n_fft, hop) must NOT take the sinebank closed form:
    ``_sinebank_session`` overlap-adds with ``rt.hop_length``, so a
    mismatched chain (e.g. OLA hop 512 vs STFT hop 256) would silently
    return half the samples of the generic scan.  ``auto`` falls back to
    the generic scan (same shape AND value), ``fused`` fails loudly."""
    from acids_transforms_tpu.streaming import scan_invert, scan_roundtrip

    n_fft, hop = 1024, 256
    T_c = 16
    chain = T.OverlapAdd(n_fft, 2 * hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode="sinebank"
    )
    rng = np.random.default_rng(7)
    mag = jnp.asarray(rng.random((2 * T_c, n_fft // 2 + 1), dtype=np.float32))
    y_g = np.asarray(
        scan_invert(chain, mag, T_c, inversion_mode="sinebank",
                    backend="generic")
    )
    y_a = np.asarray(
        scan_invert(chain, mag, T_c, inversion_mode="sinebank",
                    backend="auto")
    )
    assert y_a.shape == y_g.shape
    np.testing.assert_allclose(y_a, y_g, rtol=0, atol=1e-6)
    with pytest.raises(ValueError, match="fused"):
        scan_invert(chain, mag, T_c, inversion_mode="sinebank",
                    backend="fused")
    x = jnp.asarray(rng.standard_normal(2 * T_c * 2 * hop).astype(np.float32))
    r_g = np.asarray(
        scan_roundtrip(chain, x, T_c * 2 * hop, inversion_mode="sinebank",
                       backend="generic")
    )
    r_a = np.asarray(
        scan_roundtrip(chain, x, T_c * 2 * hop, inversion_mode="sinebank",
                       backend="auto")
    )
    assert r_a.shape == r_g.shape
    np.testing.assert_allclose(r_a, r_g, rtol=0, atol=1e-6)


def test_scan_forward_with_time_matches_eager_threading(sig):
    """``scan_forward(..., with_time=True)`` returns the frame-start times
    the reference's realtime loop would thread: chunk ``i`` fed to
    ``chain.forward_with_time`` at ``i * chunk_size / sr`` (reference
    stft.py:106-117, chain threading base.py:156-160) — bit-exact, for
    2-chains, feature 3-chains and both backends."""
    from acids_transforms_tpu.streaming import scan_forward

    n_fft, hop, chunk = 1024, 256, 4096
    x = jnp.asarray(sig[: 3 * chunk])
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop
    )
    ys, times, st = scan_forward(chain, x, chunk, with_time=True)
    assert times.shape == (ys.shape[-2],)

    eager = []
    ch2 = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop
    )
    for i in range(3):
        _, t = ch2.forward_with_time(
            x[i * chunk : (i + 1) * chunk],
            jnp.float32(i * chunk / ch2.sr),
        )
        eager.append(np.asarray(t))
    np.testing.assert_array_equal(np.concatenate(eager), np.asarray(times))

    # plain (no with_time) keeps the 2-tuple contract
    ys2, st2 = scan_forward(chain, x, chunk)
    assert ys2.shape == ys.shape

    # feature chains and the forced kernel backend agree
    feat = chain + T.Magnitude(
        mode=None, contrast="log1p", mel=True, n_fft=n_fft
    )
    _, tf, _ = scan_forward(feat, x, chunk, with_time=True)
    np.testing.assert_array_equal(np.asarray(tf), np.asarray(times))
    _, tk, _ = scan_forward(chain, x, chunk, with_time=True, backend="fused")
    np.testing.assert_array_equal(np.asarray(tk), np.asarray(times))


def test_streaming_session_encode_with_time(sig):
    """``StreamingSession.encode(chunk, with_time=True)`` threads the
    session clock: times continue across chunks, ``reset`` rewinds to
    t=0, and values equal the scan API's whole-session times."""
    from acids_transforms_tpu.serving import StreamingSession
    from acids_transforms_tpu.streaming import scan_forward

    n_fft, hop, chunk = 1024, 256, 4096
    x = jnp.asarray(sig[: 2 * chunk])
    chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop
    )
    _, times, _ = scan_forward(chain, x, chunk, with_time=True)

    sess = StreamingSession(chain, chunk)
    _, t0 = sess.encode(x[:chunk], with_time=True)
    y1, t1 = sess.encode(x[chunk:], with_time=True)
    np.testing.assert_allclose(
        np.concatenate([t0, t1]), np.asarray(times), atol=1e-7
    )
    sess.reset()
    _, t0b = sess.encode(x[:chunk], with_time=True)
    np.testing.assert_array_equal(t0b, t0)
    # the un-timed call still advances the clock
    sess.reset()
    sess.encode(x[:chunk])
    _, t1b = sess.encode(x[chunk:], with_time=True)
    np.testing.assert_array_equal(t1b, t1)


def test_pghi_gl_la0_decode_not_dominated(sig):
    """r5 boundary-freeze regression pin (VERDICT r4 weak #3): before the
    freeze, lookahead-0 ``pghi_gl`` decode committed GL-re-anchored
    boundary frames with incomplete right context and landed WORSE than
    plain ``pghi`` (SC 0.041 vs 0.017 on this class of signal) — a
    strictly dominated mode.  The frozen polish must stay at least as
    good as plain pghi, on both the generic scan and the session kernel."""
    from acids_transforms_tpu.streaming import scan_invert

    n_fft, hop, chunk = 512, 128, 2048
    st_q = T.STFT(n_fft=n_fft, hop_length=hop)
    x = jnp.asarray(sig)
    mags = jnp.abs(st_q.forward(x))
    cf = chunk // hop
    Tm = (mags.shape[-2] // cf) * cf
    mags = mags[:Tm]
    key = jax.random.PRNGKey(3)
    lag = n_fft // 2

    def sc(y):
        m = jnp.abs(st_q.forward(y[..., lag:]))
        n = min(int(m.shape[-2]), Tm) - 4
        return float(
            jnp.linalg.norm(m[..., 2:n, :] - mags[..., 2:n, :])
            / jnp.linalg.norm(mags[..., 2:n, :])
        )

    ch_p = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode="pghi"
    )
    ch_g = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop, inversion_mode="pghi_gl",
        lookahead_frames=0,
    )
    sc_p = sc(scan_invert(ch_p, mags, cf, inversion_mode="pghi", key=key,
                          backend="generic"))
    sc_gen = sc(scan_invert(ch_g, mags, cf, inversion_mode="pghi_gl",
                            key=key, backend="generic"))
    sc_ker = sc(scan_invert(ch_g, mags, cf, inversion_mode="pghi_gl",
                            key=key, backend="fused"))
    # the quality mode must not be dominated: la0 pghi_gl at least as
    # good as plain pghi (small tolerance for signal-dependent jitter)
    assert sc_gen <= sc_p * 1.05 + 1e-3, (sc_gen, sc_p)
    assert sc_ker <= sc_p * 1.05 + 1e-3, (sc_ker, sc_p)
