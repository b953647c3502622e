"""TPU measurement: chunk-DFT factored STFT vs direct windowed-frame GEMM.

Times the headline fused melspec chain and the bare STFT forward with both
formulations.  Run:
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_factored.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import HOP, N_FFT, TPU_BATCH, _device_time, _load_audio

N_ITER = 50
results = {}


def record(name, dt, frames):
    results[name] = {"sec_per_iter": dt, "frames_per_sec": frames / dt}
    print(f"{name}: {dt*1e3:.3f} ms/iter, {frames/dt/1e6:.2f} M frames/s", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.fuse import fuse_forward
    from acids_transforms_tpu.ops.fft import matmul_precision, stft_real

    x = _load_audio()
    xb = jnp.asarray(np.broadcast_to(x, (TPU_BATCH, x.shape[-1])).copy())
    chain = T.Mono() + T.STFT(n_fft=N_FFT, hop_length=HOP) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=N_FFT
    )
    chain = chain.fit(xb)
    stft_t, mag_t = chain[1], chain[2]
    T_frames = 1 + x.shape[-1] // HOP
    frames = TPU_BATCH * T_frames
    print(f"device={jax.devices()[0]}, T={T_frames}, B={TPU_BATCH}", flush=True)

    taps = stft_t._window_taps
    print("taps:", taps, flush=True)

    def fused_direct(v):
        v = v  # mono is identity on (B, L) mono input after mean? use chain[0]
        v = chain[0].forward(v)
        re, im = stft_real(v, N_FFT, HOP, stft_t.window, taps=None)
        mag = jnp.sqrt(re * re + im * im)
        mag = jnp.matmul(mag, mag_t.mel_bank, precision=matmul_precision())
        mag = mag_t.contrast(mag)
        return mag_t.norm.forward(mag)

    fused_fact = fuse_forward(chain)  # now factored via _window_taps

    # accuracy cross-check
    y_d = np.asarray(jax.jit(fused_direct)(xb[:2]))
    y_f = np.asarray(jax.jit(fused_fact)(xb[:2]))
    print("fused factored vs direct rel:",
          np.abs(y_f - y_d).max() / np.abs(y_d).max(), flush=True)

    record("fused_direct", _device_time(fused_direct, xb, N_ITER), frames)
    record("fused_factored", _device_time(fused_fact, xb, N_ITER), frames)

    def stft_direct(v):
        re, im = stft_real(v, N_FFT, HOP, stft_t.window, taps=None)
        return re * re + im * im

    def stft_fact(v):
        re, im = stft_real(v, N_FFT, HOP, stft_t.window, taps=taps)
        return re * re + im * im

    record("stft_direct", _device_time(stft_direct, xb, N_ITER), frames)
    record("stft_factored", _device_time(stft_fact, xb, N_ITER), frames)

    print(json.dumps(results), flush=True)
    with open("/tmp/sweep_factored.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
