"""Diagnose the decode-session quality gap (VERDICT r3 weak #3).

BENCH_r03: decode_pghi_spectral_convergence = 0.0624 vs the streamed
roundtrip's 0.0132 on the same content.  Hypotheses:

H1 (measurement): bench's ``sc_dec`` compares ``|STFT(y)|`` against the
   input magnitudes with NO time alignment, while the roundtrip's
   ``sc_of`` compensates the session group delay — if the decode output
   is shifted vs the offline frame timeline, the SC is inflated by a
   pure measurement artifact.
H2 (cold start): the causal session starts with zero ring/PGHI context
   while offline center-padded magnitudes embed pre-signal window halves.
H3 (mode): RT-PGHI phase estimated from offline mags degrades inherently.

Method: decode offline mags through scan_invert (generic + fused), then
scan SC over integer *sample* lags of y (computing |STFT(y[lag:])| per
lag) and report the SC-vs-lag curve.  Also decode the full complex
spectrum (explicit phase) as a lower bound — alignment artifacts show up
there as SC >> 0 at lag 0 with a sharp minimum elsewhere.

Run on TPU: ``python tools/diag_decode_gap.py``.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np

N_FFT, HOP, SR, SECONDS = 1024, 256, 44100, 4.0
CHUNK = 4096


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.streaming import scan_invert
    from bench import _load_audio

    x = _load_audio()
    xj = jnp.asarray(x)
    L = (xj.shape[-1] // CHUNK) * CHUNK
    xb = jnp.broadcast_to(xj[:L], (8, L))

    st_q = T.STFT(n_fft=N_FFT, hop_length=HOP)
    ch_p = T.OverlapAdd(N_FFT, HOP) + T.RealtimeSTFT(
        n_fft=N_FFT, hop_length=HOP, inversion_mode="pghi"
    )
    kp = jax.random.PRNGKey(0)
    T_c = CHUNK // HOP

    mags8 = jnp.abs(st_q.forward(xb))
    Tm = (mags8.shape[-2] // T_c) * T_c
    mags8 = mags8[..., :Tm, :]

    @jax.jit
    def sc_at_lag(y, lag):
        yl = jax.lax.dynamic_slice_in_dim(y, lag, y.shape[-1] - 4096, axis=-1)
        m = jnp.abs(st_q.forward(yl))
        n = min(int(m.shape[-2]), int(Tm)) - 4
        return jnp.linalg.norm(
            m[..., 2:n, :] - mags8[..., 2:n, :]
        ) / jnp.linalg.norm(mags8[..., 2:n, :])

    out = {}
    for backend in ("generic", "fused"):
        y = scan_invert(
            ch_p, mags8, T_c, inversion_mode="pghi", key=kp, backend=backend
        )
        curve = {}
        for lag in range(0, 2048 + 1, 256):
            curve[lag] = round(float(sc_at_lag(y, lag)), 4)
        out[f"pghi_{backend}"] = curve

    # explicit-phase decode as the alignment lower bound (synthesis only)
    spec8 = st_q.forward(xb)
    spec8 = spec8[..., :Tm, :]
    y_c = scan_invert(ch_p, spec8, T_c, key=kp, backend="generic")
    curve = {}
    for lag in range(0, 2048 + 1, 256):
        curve[lag] = round(float(sc_at_lag(y_c, lag)), 4)
    out["complex_generic"] = curve

    # cross-correlate decode output vs input to find the true lag
    y_np = np.asarray(
        scan_invert(ch_p, mags8, T_c, inversion_mode="pghi", key=kp,
                    backend="generic")
    )[0]
    xc = np.correlate(y_np[: 4 * SR], np.asarray(xj[: 2 * SR]), mode="valid")
    out["xcorr_best_lag"] = int(np.argmax(np.abs(xc)))
    y_cn = np.asarray(y_c[0].astype(jnp.float32))
    xc2 = np.correlate(y_cn[: 4 * SR], np.asarray(xj[: 2 * SR]), mode="valid")
    out["xcorr_complex_best_lag"] = int(np.argmax(np.abs(xc2)))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
