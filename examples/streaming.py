"""Streaming: a chunked realtime session compiled to one lax.scan.

The OverlapAdd + RealtimeSTFT chain processes 4096-sample chunks with
explicit ring-buffer state; the whole session (framing, FFT, inverse,
overlap-add, state threading) is a single on-device scan.  On TPU,
``scan_roundtrip`` auto-dispatches recognized direct roundtrips to ONE
Pallas kernel for the whole session (ops/pallas/stream_step.py, ~1.8x the
generic scan); pass ``backend="generic"`` to force the plain chain scan,
or ``inversion_mode="pghi_gl"`` etc. for phaseless streaming (the
magnitude is taken before inversion, as in the reference loop).
"""
import numpy as np
import jax.numpy as jnp

import acids_transforms_tpu as att
from acids_transforms_tpu import transforms as T


def main():
    sr = 44100
    t = np.arange(4 * sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    chain = T.OverlapAdd(1024, 256) + T.RealtimeSTFT(n_fft=1024, hop_length=256)

    # whole chunked session in one scan (analysis + resynthesis)
    y = att.scan_roundtrip(chain, jnp.asarray(x), chunk_size=4096)
    delay = (1024 // 256 - 1) * 256  # streaming latency in samples
    n = min(x.shape[-1], y.shape[-1] - delay) - 2048
    err = np.abs(np.asarray(y)[delay: delay + n] - x[:n]).max()
    print("streaming round-trip, unity gain; max err:", err)

    # manual chunk loop with explicit state (e.g. inside a larger model)
    state = chain.init_state(())
    outs = []
    for i in range(0, x.shape[-1] - 4096 + 1, 4096):
        state, frames = chain.step(state, jnp.asarray(x[i: i + 4096]))
        # ... per-frame processing would go here ...
        state, rec = chain.step_invert(state, frames)
        outs.append(np.asarray(rec))
    print("manual loop chunks:", len(outs), outs[0].shape)




def vocoder_serving():
    """The serving triad: encode (features for a model), decode (vocoder),
    and a live chunk-by-chunk session.

    On TPU each direction auto-dispatches to a whole-session Pallas kernel
    (a single phaseless decode stream runs ~1000x realtime); on CPU the
    same code runs the generic scans.
    """
    import jax

    from acids_transforms_tpu.serving import StreamingSession
    from acids_transforms_tpu.streaming import scan_forward, scan_invert

    sr = 44100
    t = np.arange(2 * sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    # feature chain: normalized log-mel in/out (fit the norm first)
    chain = (
        T.OverlapAdd(1024, 256)
        + T.RealtimeSTFT(n_fft=1024, hop_length=256, inversion_mode="pghi")
        + T.Magnitude(mode="unipolar", contrast="log1p", mel=True, n_fft=1024)
    )
    chain = chain.fit(jnp.asarray(x))

    # encode: audio -> model features, one scan (+ resumable state);
    # with_time=True also returns the frame-start seconds the reference's
    # realtime loop would thread (time-aligned features for the model)
    feats, times, state = scan_forward(
        chain, jnp.asarray(x), chunk_size=4096, with_time=True
    )
    print("frame times:", times.shape, float(times[0]), "->", float(times[-1]))
    # ... feats -> your model -> feats' ...
    # decode: features -> audio, one scan (16 frames = 4096 samples/chunk)
    audio = scan_invert(
        chain, feats, 16, inversion_mode="pghi", key=jax.random.PRNGKey(0)
    )
    print("vocoder decode:", feats.shape, "->", audio.shape)

    # live session: chunks arrive one at a time (an audio callback)
    sess = StreamingSession(
        chain, 4096, inversion_mode="pghi", key=jax.random.PRNGKey(1)
    )
    sess.warmup()  # compile both directions before the first real chunk
    for i in range(3):
        chunk = jnp.asarray(x[i * 4096: (i + 1) * 4096])
        f, ts = sess.encode(chunk, with_time=True)  # features + frame times
        out = sess.decode(f)            # vocoded audio, state carried
    print("live session chunk:", out.shape, "last frame t:", float(ts[-1]))
    # multi-chip fleets: StreamingSession(..., mesh=parallel.make_mesh(...))
    # steps each device's local sessions under shard_map (see README)


if __name__ == "__main__":
    main()
    vocoder_serving()
