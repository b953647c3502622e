"""TPU probe of the nyquist-depadded kernels (r3.6).

Measures, at the DGT (gaussian full-K) shape and the factored headline
shape: the Pallas fused path, the XLA fused path, and the chain — plus the
kernel-vs-chain max rel diff as the accuracy gate.  Compare against the
recorded pre-depad numbers (BENCH_NOTES.md: full-K 15.61M vs XLA 15.87M at
the DGT shape; factored 27-32M at the headline shape).

Run:  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_depad.py
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
    from acids_transforms_tpu.fuse import fuse_forward

    x = _load_audio()
    print(f"device={jax.devices()[0]}", flush=True)
    results = {}

    cases = [
        ("dgt_1024_256_b128", "dgt", 1024, 256, 128),
        ("stft_1024_256_b128", "stft", 1024, 256, 128),
        ("stft_512_128_b128", "stft", 512, 128, 128),
        ("dgt_2048_512_b64", "dgt", 2048, 512, 64),
    ]
    for key, kind, n_fft, hop, batch in cases:
        xb = jnp.asarray(np.broadcast_to(x, (batch, x.shape[-1])).copy())
        spec = T.DGT if kind == "dgt" else T.STFT
        chain = (
            T.Mono()
            + spec(n_fft=n_fft, hop_length=hop)
            + T.Magnitude(mode="unipolar", contrast="log1p", mel=True, n_fft=n_fft)
        ).fit(xb[:2])
        T_frames = 1 + x.shape[-1] // hop
        frames = batch * T_frames

        ref = np.asarray(jax.device_get(chain.jforward(xb[:4])))
        row = {}
        for backend in ("pallas", "xla"):
            fn = fuse_forward(chain, backend)
            y = np.asarray(jax.device_get(fn(xb[:4])))
            rel = float(np.abs(y - ref).max() / np.abs(ref).max())
            dt = _device_time(jax.jit(fn), xb, N_ITER)
            row[backend] = {
                "frames_per_sec": round(frames / dt),
                "ms": round(dt * 1e3, 3),
                "rel_vs_chain": rel,
            }
        dt = _device_time(jax.jit(chain.jforward), xb, N_ITER)
        row["chain"] = {"frames_per_sec": round(frames / dt), "ms": round(dt * 1e3, 3)}
        row["pallas_over_xla"] = round(
            row["pallas"]["frames_per_sec"] / row["xla"]["frames_per_sec"], 3
        )
        results[key] = row
        print(key, json.dumps(row), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
