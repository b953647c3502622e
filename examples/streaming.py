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


if __name__ == "__main__":
    main()
