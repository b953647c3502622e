"""Timing decomposition of the factored kernel: which stage costs what.

Variants (timing-only; some are numerically wrong on purpose):
  full        — taps P=1 + mel (the shipped kernel)
  taps_p0     — taps=(0.5,): no lane rolls / edge fixes (isolates taps cost)
  no_mel      — mel=None (isolates the mel GEMM)
  p0_no_mel   — both off (chunk dots + twiddle combine + mag only)

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_kernel_parts.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import HOP, N_FFT, TPU_BATCH, _device_time, _load_audio

N_ITER = 50


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu.ops.fft import taps_for_window
    from acids_transforms_tpu.ops.mel import square_mel_banks
    from acids_transforms_tpu.ops.pallas.spectral import fused_melspec
    from acids_transforms_tpu.ops.windows import get_window

    x = _load_audio()
    xb = jnp.asarray(np.broadcast_to(x, (TPU_BATCH, x.shape[-1])).copy())
    w = get_window("hann", N_FFT)
    taps = taps_for_window(np.asarray(w))
    bank = jnp.asarray(square_mel_banks(N_FFT, 44100)[0])
    T_frames = 1 + x.shape[-1] // HOP
    frames = TPU_BATCH * T_frames
    print(f"device={jax.devices()[0]}", flush=True)

    def variant(name, use_taps, use_mel, contrast="log1p", power=1.0, ablate=None):
        def f(v):
            return fused_melspec(
                v, N_FFT, HOP, w, bank if use_mel else None,
                0.0, 1.0, contrast, taps=use_taps, power=power, ablate=ablate,
            )
        dt = _device_time(f, xb, N_ITER)
        print(f"{name}: {dt*1e3:.3f} ms/iter, {frames/dt/1e6:.2f} M frames/s",
              flush=True)
        return dt

    variant("full", taps, True)
    variant("taps_p0", (0.5,), True)          # no taps conv (no lane rolls)
    variant("no_mel", taps, False)
    variant("p0_no_mel", (0.5,), False)
    variant("no_combine", taps, True, ablate="combine")   # chunk dots + mag + mel only
    variant("no_contrast", taps, True, contrast="none")   # isolate log1p
    variant("power2", taps, True, power=2.0)              # isolate sqrt
    variant("dots1", taps, True, ablate="dots1")          # single-pass bf16 dots
    variant("dots1_p0", (0.5,), True, ablate="dots1")
    variant("bare", (0.5,), False, contrast="none", power=2.0, ablate="dots1")


if __name__ == "__main__":
    main()
