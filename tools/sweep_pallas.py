"""TPU sweep: Pallas fused kernels (full-K and chunk-factored) vs XLA fused.

Times, on the real chip (bench.py methodology):
  * XLA fused forward (the round-1 headline path)
  * Pallas full-K windowed kernel (v3, pipelined Element tiles)
  * Pallas chunk-factored kernel at several tile_t values
  * fit: XLA cascade vs the fused stats epilogue (both kernel formulations)

Run:  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_pallas.py
Results land in /tmp/sweep_pallas.json as they complete.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import HOP, N_FFT, TPU_BATCH, _device_time, _load_audio

N_ITER = 50
OUT = "/tmp/sweep_pallas.json"
results = {}


def record(name, dt, frames):
    results[name] = {"sec_per_iter": dt, "frames_per_sec": frames / dt}
    print(f"{name}: {dt*1e3:.3f} ms/iter, {frames/dt/1e6:.2f} M frames/s", flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.fuse import fuse_fit, fuse_forward
    from acids_transforms_tpu.ops.pallas.spectral import fused_melspec

    x = _load_audio()
    xb = jnp.asarray(np.broadcast_to(x, (TPU_BATCH, x.shape[-1])).copy())
    chain = T.Mono() + T.STFT(n_fft=N_FFT, hop_length=HOP) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=N_FFT
    )
    chain = chain.fit(xb)
    mono, stft_t, mag_t = chain[0], chain[1], chain[2]
    taps = stft_t._window_taps
    T_frames = 1 + x.shape[-1] // HOP
    frames = TPU_BATCH * T_frames
    print(f"device={jax.devices()[0]}, T={T_frames}, B={TPU_BATCH}, taps={taps}",
          flush=True)

    fused_xla = fuse_forward(chain)
    record("xla_fused", _device_time(fused_xla, xb, N_ITER), frames)
    y_ref = np.asarray(jax.jit(fused_xla)(xb[:2]))

    def pallas_variant(tile, use_taps):
        def pall(v):
            y = mono.forward(v)
            return fused_melspec(
                y, N_FFT, HOP, stft_t.window, mag_t.mel_bank,
                float(mag_t.norm.offset), float(mag_t.norm.scale),
                mag_t.contrast_mode, tile_t=tile,
                taps=taps if use_taps else None,
            )
        return pall

    cases = [
        ("pallas_fullk_auto", None, False),
        ("pallas_fact_auto", None, True),
        ("pallas_fact_128", 128, True),
        ("pallas_fact_256", 256, True),
        ("pallas_fact_344", 344, True),
    ]
    for name, tile, use_taps in cases:
        try:
            pall = pallas_variant(tile, use_taps)
            t0 = time.time()
            y_p = np.asarray(jax.jit(pall)(xb[:2]))
            print(f"{name}: compiled in {time.time()-t0:.0f}s, rel err "
                  f"{np.abs(y_p - y_ref).max() / np.abs(y_ref).max():.2e}", flush=True)
            record(name, _device_time(pall, xb, N_ITER), frames)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
            results[name] = {"error": str(e)[:400]}
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1)

    # fit
    unfitted = T.Mono() + T.STFT(n_fft=N_FFT, hop_length=HOP) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=N_FFT
    )

    def fit_xla(v):
        f = unfitted.fit(v)
        return jnp.stack([f[-1].norm.offset, f[-1].norm.scale])

    record("fit_xla", _device_time(fit_xla, xb, N_ITER), frames)

    try:
        ffit = fuse_fit(unfitted)  # factored via _window_taps

        def fit_pallas(v):
            f = ffit(v)
            return jnp.stack([f[-1].norm.offset, f[-1].norm.scale])

        a = np.asarray(jax.jit(fit_pallas)(xb[:2]))
        b = np.asarray(jax.jit(fit_xla)(xb[:2]))
        print(f"fit stats fused={a} xla={b}", flush=True)
        record("fit_pallas_fact", _device_time(fit_pallas, xb, N_ITER), frames)
    except Exception as e:
        print(f"fit_pallas_fact FAILED: {type(e).__name__}: {e}", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
