"""TPU probe: explicit-phase synthesis — XLA istft vs the fused synthesis
kernel (ops/pallas/pghi_kernel.py:pghi_synthesize_fused).

The complex-input ``STFT.invert`` / phase-faithful serving path currently
rides the XLA GEMM istft; the fused kernel (windowed iDFT + in-VMEM OLA)
measured 1.8-2.8x at small hops (r3.14).  This sweep measures the headline
shapes to decide whether the invert dispatch should prefer the kernel.
Accuracy gate: time-domain max rel diff vs the XLA istft on the same
(mag, phase) input, fetched as a real scalar.

Run:  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_istft.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import _device_time, _load_audio

N_ITER = 50


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.ops.fft import istft
    from acids_transforms_tpu.ops.pallas.pghi_kernel import (
        pghi_synthesize_fused,
    )
    from acids_transforms_tpu.ops.phase import expi

    x = _load_audio()
    print(f"device={jax.devices()[0]}", flush=True)
    results = {}

    cases = [
        ("stft_1024_256_b128", "stft", 1024, 256, 128),
        ("stft_512_128_b128", "stft", 512, 128, 128),
        ("dgt_1024_256_b128", "dgt", 1024, 256, 128),
        ("stft_512_64_b32", "stft", 512, 64, 32),
    ]
    for key, kind, n_fft, hop, batch in cases:
        xb = jnp.asarray(np.broadcast_to(x, (batch, x.shape[-1])).copy())
        spec_cls = T.DGT if kind == "dgt" else T.STFT
        st = spec_cls(n_fft=n_fft, hop_length=hop)
        spec = jax.jit(st.forward)(xb)
        mag = jnp.abs(spec)
        ph = jnp.angle(spec)
        T_frames = spec.shape[-2]
        frames = batch * T_frames
        length = hop * (T_frames - 1)

        def xla_path(m, p):
            return istft(
                m * expi(p), n_fft, hop, st.inv_window,
                impl=st.impl, taps=st._inv_window_taps,
            )

        def fused_path(m, p):
            return pghi_synthesize_fused(
                m, p, n_fft, hop, st.inv_window, length=length,
            )

        y_x = jax.jit(xla_path)(mag, ph)
        y_f = jax.jit(fused_path)(mag, ph)
        n = min(y_x.shape[-1], y_f.shape[-1])

        @jax.jit
        def relerr(a, b):
            return jnp.max(jnp.abs(a[..., :n] - b[..., :n])) / jnp.max(
                jnp.abs(a)
            )

        rel = float(relerr(y_x, y_f))
        dt_x = _device_time(
            jax.jit(lambda m: xla_path(m, ph)), mag, N_ITER
        )
        dt_f = _device_time(
            jax.jit(lambda m: fused_path(m, ph)), mag, N_ITER
        )
        row = {
            "xla_frames_per_sec": round(frames / dt_x),
            "fused_frames_per_sec": round(frames / dt_f),
            "xla_ms": round(dt_x * 1e3, 3),
            "fused_ms": round(dt_f * 1e3, 3),
            "fused_over_xla": round(dt_x / dt_f, 3),
            "rel": rel,
        }
        results[key] = row
        print(key, json.dumps(row), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
