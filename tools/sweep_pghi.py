"""PGHI inversion timing decomposition on the v5e (VERDICT r2/r3 #4).

Times, at the bench shape (DGT 1024/256, batch 8 x 4 s):

  grads+anchors   phase_gradients + anchor masks + trapezoids (precompute)
  scan_serial     the serial lax.scan time recurrence
  scan_blocked_N  the sqrt-blocked recurrence at several block sizes
  istft           mag * e^{i phi} -> ISTFT
  full_invert     DGT.invert(mode="pghi") end to end

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_pghi.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import HOP, N_FFT, _device_time, _load_audio

N_ITER = 20


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.ops import pghi as P

    x = _load_audio()
    dgt = T.DGT(n_fft=N_FFT, hop_length=HOP)
    xb = jnp.asarray(np.broadcast_to(x, (8, x.shape[-1])).copy())
    mag = jnp.abs(dgt.forward(xb))
    Tn = mag.shape[-2]
    frames = 8 * Tn
    print(f"device={jax.devices()[0]} T={Tn}", flush=True)

    gamma, tol = dgt.gamma, dgt.tolerance

    def pre(m):
        ts, fs = P.phase_gradients(m, gamma, N_FFT, HOP, time_stencil="backward")
        mx = jnp.max(m, axis=(-2, -1), keepdims=True)
        abstol = jnp.maximum(tol * mx, 1.19e-7)[..., 0, :]
        prev_m = jnp.concatenate([jnp.zeros_like(m[..., :1, :]), m[..., :-1, :]], axis=-2)
        anchored, sig = P._anchor_mask(m, prev_m, abstol)
        c = (jnp.concatenate([ts[..., :1, :], ts[..., :-1, :]], axis=-2) + ts) / 2.0
        return anchored, sig, c, fs

    dt = _device_time(lambda m: pre(m)[2], mag, N_ITER)
    print(f"grads+anchors: {dt*1e3:.3f} ms ({frames/dt/1e6:.2f} M)", flush=True)

    dt = _device_time(
        lambda m: P.pghi_scan(m, gamma, N_FFT, HOP, tolerance=tol, parallel=False),
        mag, N_ITER,
    )
    print(f"scan_serial: {dt*1e3:.3f} ms ({frames/dt/1e6:.2f} M)", flush=True)

    for block in (4, 8, 16, 32):
        dt = _device_time(
            lambda m: P.pghi_scan(m, gamma, N_FFT, HOP, tolerance=tol,
                                  parallel=True, block=block),
            mag, N_ITER,
        )
        print(f"scan_blocked_{block}: {dt*1e3:.3f} ms ({frames/dt/1e6:.2f} M)", flush=True)

    from acids_transforms_tpu.ops.fft import istft

    phase = P.pghi_scan(mag, gamma, N_FFT, HOP, tolerance=tol)
    dt = _device_time(
        lambda m: istft(m * jnp.exp(1j * phase), N_FFT, HOP, dgt.inv_window),
        mag, N_ITER,
    )
    print(f"istft: {dt*1e3:.3f} ms ({frames/dt/1e6:.2f} M)", flush=True)

    dt = _device_time(
        lambda m: dgt.invert(m, inversion_mode="pghi"), mag, N_ITER
    )
    print(f"full_invert: {dt*1e3:.3f} ms ({frames/dt/1e6:.2f} M)", flush=True)


if __name__ == "__main__":
    main()
