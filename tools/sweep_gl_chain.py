"""Sweep the fused GL kernel's per-invocation chain length (GL_CHAIN).

Same-process A/B at the bench GL shape (1024/256, batch 8 x 4 s,
24 iterations — divisible by every swept k so no remainder singles).
Each k runs the identical momentum-GL recurrence; interior rows are
bit-exact across k (suite-tested), so throughput is the only variable.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_gl_chain.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import HOP, N_FFT, _device_time, _load_audio

N_ITER_GL = 24
REPS = 12


def main():
    import jax.numpy as jnp

    import acids_transforms_tpu.ops.griffinlim as G
    from acids_transforms_tpu.ops.fft import stft, taps_for_window
    from acids_transforms_tpu.ops.windows import get_window

    x = _load_audio()
    xb = jnp.asarray(np.broadcast_to(x, (8, x.shape[-1])).copy())
    w = get_window("hann", N_FFT)
    taps = taps_for_window(np.asarray(w))
    mag = jnp.abs(stft(xb, N_FFT, HOP, w))
    frames = mag.shape[0] * mag.shape[1]
    print(f"mag {mag.shape}, {N_ITER_GL}-iter GL, frames/iter {frames}", flush=True)

    for k in (1, 2, 3, 4, 6):
        G.GL_CHAIN = k
        fn = lambda m: G.griffin_lim(
            m, N_FFT, HOP, w, n_iter=N_ITER_GL, taps=taps, fused=True
        )
        dt = _device_time(fn, mag, REPS)
        print(
            f"chain={k}: {dt*1e3:7.2f} ms  {frames/dt/1e3:6.1f} K frames/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
