"""Experiment: freeze context-incomplete boundary frames in the streaming
pghi_gl polish (VERDICT r4 weak #3).

At lookahead 0 the per-chunk GL projection re-anchors the trailing
``overlap-1`` frames whose overlap-add context is incomplete on the right
— committing phases WORSE than the plain PGHI scan (decode SC 0.0388 vs
0.0133 at the bench shape, BENCH_r04).  Hypothesis: frames that are both
(a) committed this chunk and (b) inside the right-context-incomplete tail
should keep their causal-PGHI phase instead of the damaged GL update.
freeze_n = max(0, overlap-1 - lookahead) — exactly 0 at la >= overlap-1,
so the winning la4 configuration is untouched by construction.

CPU run (quality is platform-independent):
    ACIDS_EXP_FREEZE=1 python tools/exp_gl_boundary.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.streaming import scan_invert

    N_FFT, HOP, SR = 1024, 256, 44100
    L = (4 * SR // 4096) * 4096
    t = np.arange(L) / SR
    x = sum(np.sin(2 * np.pi * f * t) / (i + 1)
            for i, f in enumerate([220, 440, 660, 880]))
    x = (0.5 * x / np.abs(x).max()).astype(np.float32)
    xb = jnp.asarray(np.broadcast_to(x, (2, L)).copy())

    st_q = T.STFT(n_fft=N_FFT, hop_length=HOP)
    mags = jnp.abs(st_q.forward(xb))
    Tm = (mags.shape[-2] // (4096 // HOP)) * (4096 // HOP)
    mags = mags[..., :Tm, :]
    kp = jax.random.PRNGKey(0)

    def sc_at(y, lag):
        m = jnp.abs(st_q.forward(y[..., lag:]))
        n = min(int(m.shape[-2]), Tm) - 4
        return float(jnp.linalg.norm(m[..., 2:n, :] - mags[..., 2:n, :])
                     / jnp.linalg.norm(mags[..., 2:n, :]))

    dec_delay = N_FFT // 2
    for la in (0, 1, 2, 4):
        ch = T.OverlapAdd(N_FFT, HOP) + T.RealtimeSTFT(
            n_fft=N_FFT, hop_length=HOP, inversion_mode="pghi_gl",
            lookahead_frames=la,
        )
        y = scan_invert(ch, mags, 4096 // HOP, inversion_mode="pghi_gl",
                        key=kp, backend="generic")
        print("la=%d sc=%.4f" % (la, sc_at(y, dec_delay + la * HOP)), flush=True)
    ch_p = T.OverlapAdd(N_FFT, HOP) + T.RealtimeSTFT(
        n_fft=N_FFT, hop_length=HOP, inversion_mode="pghi"
    )
    y_p = scan_invert(ch_p, mags, 4096 // HOP, inversion_mode="pghi",
                      key=kp, backend="generic")
    print("plain pghi sc=%.4f" % sc_at(y_p, dec_delay), flush=True)


if __name__ == "__main__":
    main()
