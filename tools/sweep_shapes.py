"""TPU shape sweep of the fused paths: pallas chunk-factored vs XLA fused.

Covers hop ratios (overlap 2/4/8), n_fft 512-2048 and batch sizes, printing
frames/s for both backends plus the kernel's accuracy vs the chain.

Run:  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_shapes.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import SECONDS, SR, _device_time, _load_audio

N_ITER = 50
results = {}


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.fuse import fusable, fuse_forward

    x = _load_audio()
    print(f"device={jax.devices()[0]}", flush=True)

    cases = [
        # (n_fft, hop, batch)
        (1024, 256, 128),
        (1024, 128, 128),   # overlap 8: 8x factored FLOP saving
        (1024, 512, 128),   # overlap 2
        (512, 128, 128),
        (2048, 512, 64),
        (1024, 256, 16),    # small batch
        (1024, 256, 512),   # large batch
    ]
    for n_fft, hop, batch in cases:
        key = f"nfft{n_fft}_hop{hop}_b{batch}"
        xb = jnp.asarray(np.broadcast_to(x, (batch, x.shape[-1])).copy())
        chain = (T.Mono() + T.STFT(n_fft=n_fft, hop_length=hop) + T.Magnitude(
            mode="unipolar", contrast="log1p", mel=True, n_fft=n_fft
        )).fit(xb[:2])
        T_frames = 1 + x.shape[-1] // hop
        frames = batch * T_frames

        fx = fuse_forward(chain, backend="xla")
        dt_x = _device_time(fx, xb, N_ITER)
        row = {"xla_fused_Mfps": round(frames / dt_x / 1e6, 2)}
        if fusable(chain, "pallas"):
            fp = fuse_forward(chain, backend="pallas")
            y_p = np.asarray(jax.jit(fp)(xb[:2]))
            y_x = np.asarray(jax.jit(fx)(xb[:2]))
            rel = float(np.abs(y_p - y_x).max() / np.abs(y_x).max())
            dt_p = _device_time(fp, xb, N_ITER)
            row.update(
                pallas_Mfps=round(frames / dt_p / 1e6, 2),
                speedup=round(dt_x / dt_p, 2),
                rel_err=f"{rel:.1e}",
            )
        results[key] = row
        print(key, row, flush=True)
        with open("/tmp/sweep_shapes.json", "w") as f:
            json.dump(results, f, indent=1)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
