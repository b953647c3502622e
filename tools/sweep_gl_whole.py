"""Whole-signal GL chaining: all iterations in ONE kernel invocation.

The r3.9 chained kernel (make_gl_momentum_step(iters=k)) caps k at 4
because with frame-tiled grids the halo (k*(overlap-1) rows per side) is
re-fetched per tile and overtakes the saved invocation state traffic.
With ONE tile per batch row (tile_t >= T) there is no inter-tile
re-fetch at all: the halo is zero-magnitude padding whose Y = mag*angles
contribution is exactly zero, so chaining the FULL iteration budget into
one invocation is semantically identical (bit-exact, checked below) and
eliminates every inter-invocation HBM state round-trip.

Sweeps (tile, chain) at the bench GL shape; validates variants agree.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_gl_whole.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import HOP, N_FFT, _device_time, _load_audio

N_ITER = 24
REPS = 12
MOM = 0.99


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu.ops.fft import istft, stft, taps_for_window
    from acids_transforms_tpu.ops.pallas.glstep import make_gl_momentum_step
    from acids_transforms_tpu.ops.windows import get_window

    x = _load_audio()
    xb = jnp.asarray(np.broadcast_to(x, (8, x.shape[-1])).copy())
    w = get_window("hann", N_FFT)
    taps = taps_for_window(np.asarray(w))
    mag = jnp.abs(stft(xb, N_FFT, HOP, w))
    B, T, F = mag.shape
    frames = B * T
    mom = MOM / (1.0 + MOM)
    t8 = -(-T // 8) * 8
    print(f"mag {mag.shape}, {N_ITER}-iter GL, t8={t8}", flush=True)

    kr, ki = jax.random.split(jax.random.PRNGKey(0))
    a0 = jax.lax.complex(
        jax.random.normal(kr, mag.shape), jax.random.normal(ki, mag.shape)
    )
    a0 = a0 / jnp.maximum(jnp.abs(a0), jnp.finfo(jnp.float32).tiny)
    are0, aim0 = jnp.real(a0), jnp.imag(a0)

    def make_fn(chain_k, tile_t):
        step, to_rows, from_rows = make_gl_momentum_step(
            mag, N_FFT, HOP, taps, w, mom, iters=chain_k, tile_t=tile_t
        )
        groups = N_ITER // chain_k

        def fn(m):
            are_r, aim_r = to_rows(are0), to_rows(aim0)
            z = jnp.zeros_like(are_r)
            carry = (are_r, aim_r, z, z)
            carry = jax.lax.fori_loop(0, groups, lambda _, c: step(*c), carry)
            are_r, aim_r, _, _ = carry
            ang = jax.lax.complex(from_rows(are_r), from_rows(aim_r))
            return istft(m * ang, N_FFT, HOP, w, taps=taps)

        return fn

    configs = {
        "4t": ("k=4  tiled (current)", 4, None),
        "4w": ("k=4  whole-tile", 4, t8),
        "8w": ("k=8  whole-tile", 8, t8),
        "12w": ("k=12 whole-tile", 12, t8),
        "24w": ("k=24 whole-tile (1 invocation)", 24, t8),
    }
    picked = sys.argv[1:] or list(configs)
    unknown = [k for k in picked if k not in configs]
    if unknown:
        raise SystemExit(f"unknown configs {unknown}; choose from {list(configs)}")
    ref = ref_label = None
    for key in picked:
        label, chain_k, tile_t = configs[key]
        fn = make_fn(chain_k, tile_t)
        out = np.asarray(fn(mag))
        n_bad = int(np.size(out) - np.isfinite(out).sum())
        if ref is None:
            ref, ref_label = out, label.split()[0]
        d = float(np.max(np.abs(out - ref)))
        dt = _device_time(fn, mag, REPS)
        print(
            f"{label:32s} {dt*1e3:7.2f} ms  {frames/dt/1e3:6.1f} K frames/s"
            f"  max|d| vs {ref_label}: {d:.2e}  non-finite: {n_bad}",
            flush=True,
        )


if __name__ == "__main__":
    main()
