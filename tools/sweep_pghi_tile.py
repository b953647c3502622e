"""tile_f sweep for the fused PGHI inversion kernel (r3.5 re-tune).

The r3.5 tile-level precompute changed the kernel's cost structure (the
per-frame serial step shrank ~3x; the per-tile vector work grew), so the
tile_f=64 default tuned for the r3 kernel may be stale.  Times
``pghi_invert_fused`` at the bench shape (DGT 1024/256, batch 8 x 4 s)
across tile_f, plus the phases-only mode.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_pghi_tile.py
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
    from acids_transforms_tpu.ops.pallas.pghi_kernel import (
        pghi_invert_fused,
        pghi_phases_fused,
    )

    x = _load_audio()
    dgt = T.DGT(n_fft=N_FFT, hop_length=HOP)
    xb = jnp.asarray(np.broadcast_to(x, (8, x.shape[-1])).copy())
    mag = jnp.abs(dgt.forward(xb))
    Tn = mag.shape[-2]
    frames = 8 * Tn
    print(f"device={jax.devices()[0]} T={Tn}", flush=True)

    gamma, tol = dgt.gamma, dgt.tolerance
    w = dgt.inv_window
    ref = None
    for tile_f in (32, 64, 96, 128, 160, 224):
        try:
            fn = lambda m: pghi_invert_fused(
                m, gamma, N_FFT, HOP, w, tolerance=tol, tile_f=tile_f
            )
            y = fn(mag)
            v = float(jnp.mean(jnp.abs(y)))
            if ref is None:
                ref = y
                d = 0.0
            else:
                d = float(jnp.max(jnp.abs(y - ref)))
            dt = _device_time(fn, mag, N_ITER)
            print(
                f"invert tile_f={tile_f}: {dt*1e3:.3f} ms "
                f"({frames/dt/1e6:.2f} M) mean={v:.5f} maxdiff={d:.2e}",
                flush=True,
            )
        except Exception as e:  # VMEM overflow etc.
            print(f"invert tile_f={tile_f}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

    for tile_f in (64, 128):
        fn = lambda m: pghi_phases_fused(
            m, gamma, N_FFT, HOP, tolerance=tol, tile_f=tile_f
        )
        dt = _device_time(fn, mag, N_ITER)
        print(f"phases tile_f={tile_f}: {dt*1e3:.3f} ms ({frames/dt/1e6:.2f} M)", flush=True)


if __name__ == "__main__":
    main()
