"""TPU A/B of the GL projection kernel with/without the nyquist depad.

Monkeypatches the `_nyq_depad` gate to force the padded layout, clearing jit
caches between runs (the weights are built inside the jitted `_gl_call` from
static args, so a stale cache would silently reuse the other layout's
executable).

Run:  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_gl_depad.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import _device_time, _load_audio

N_ITER = 20


def main():
    import jax
    import jax.numpy as jnp

    import acids_transforms_tpu.ops.pallas.spectral as S
    from acids_transforms_tpu.ops.fft import taps_for_window
    from acids_transforms_tpu.ops.griffinlim import griffin_lim
    from acids_transforms_tpu.ops.fft import stft
    from acids_transforms_tpu.ops.windows import get_window

    x = _load_audio()
    print(f"device={jax.devices()[0]}", flush=True)
    n_fft, hop, batch = 1024, 256, 8
    w = get_window("hann", n_fft)
    taps = taps_for_window(np.asarray(w))
    xb = jnp.asarray(np.broadcast_to(x, (batch, x.shape[-1])).copy())
    mag = jnp.abs(stft(xb, n_fft, hop, w))
    T = mag.shape[-2]
    frames = batch * T

    def run(depad):
        jax.clear_caches()
        orig = S._nyq_depad
        S._nyq_depad = (lambda *a, **k: False) if not depad else orig
        try:
            fn = jax.jit(
                lambda m: griffin_lim(m, n_fft, hop, w, n_iter=30, taps=taps, fused=True)
            )
            dt = _device_time(fn, mag, N_ITER)
        finally:
            S._nyq_depad = orig
        return dt

    for name, depad in [("padded", False), ("depad", True)]:
        dt = run(depad)
        print(f"gl_fused[{name}]: {dt*1e3:.2f} ms  {frames/dt/1e3:.1f} K frames/s", flush=True)


if __name__ == "__main__":
    main()
