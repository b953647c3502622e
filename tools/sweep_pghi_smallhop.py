"""Packed/lcm-packed PGHI kernel vs the sqrt-blocked XLA fallback (v5e).

The fused PGHI kernel historically required hop % 128 == 0; the packed
small-hop synthesis (q = 128/hop frames per lane chunk) extended it to any
hop dividing 128, and the lcm-packed OLA (ops/pallas/ola.py) to any
hop % 8 == 0 at lane-multiple n_fft (q = 128/gcd(hop,128) frames per
super-frame of q*hop samples, OLA at super-frame stride q*hop/128 chunks).
This sweep validates the kernel output against scan+ISTFT on-chip and
times both paths at small-hop and unaligned-hop DGT shapes.

Run (background, one TPU process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  PYTHONUNBUFFERED=1 timeout 1800 python tools/sweep_pghi_smallhop.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import _device_time

N_ITER = 20
SECONDS = 4.0
SR = 44100
BATCH = 8


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.ops import pghi as P
    from acids_transforms_tpu.ops.fft import istft
    from acids_transforms_tpu.ops.phase import expi
    from acids_transforms_tpu.ops.pallas.pghi_kernel import (
        pghi_fused_available,
        pghi_invert_fused,
    )

    print(f"device={jax.devices()[0]}", flush=True)
    t = np.arange(int(SECONDS * SR)) / SR
    x = sum(
        np.sin(2 * np.pi * f * t) / (i + 1)
        for i, f in enumerate([220, 440, 880, 1760])
    )
    x = (0.7 * x / np.abs(x).max()).astype(np.float32)

    shapes = [(512, 64), (1024, 64), (512, 32)]
    if "--lcm" in sys.argv:
        # the lcm-packed region: hops neither multiples nor divisors of 128
        shapes = [(768, 192), (640, 160), (768, 96), (1536, 192)]
    for n_fft, hop in shapes:
        assert pghi_fused_available(n_fft, hop), (n_fft, hop)
        dgt = T.DGT(n_fft=n_fft, hop_length=hop)
        xb = jnp.asarray(np.broadcast_to(x, (BATCH, x.shape[-1])).copy())
        mag = jnp.abs(dgt.forward(xb))
        Tn = mag.shape[-2]
        frames = BATCH * Tn
        gamma, tol = dgt.gamma, float(dgt.tolerance)
        key = jax.random.PRNGKey(0)
        angles = 2.0 * jnp.pi * jax.random.uniform(key, mag.shape, mag.dtype)

        # correctness on-chip: kernel vs scan+ISTFT with pinned angles
        # (expi: complex ops must stay inside jit on the tunnel)
        @jax.jit
        def ref_path(m):
            ph = P.pghi_scan(
                m, gamma, n_fft, hop, tolerance=tol, parallel=False,
                key=key, time_stencil="central",
            )
            return istft(m * expi(ph), n_fft, hop, dgt.inv_window)

        rec_ref = ref_path(mag)
        rec_f = pghi_invert_fused(
            mag, gamma, n_fft, hop, dgt.inv_window, tolerance=tol,
            angles=angles, interpret=False,
        )
        # fetch real scalars only (complex transfer unimplemented on tunnel)
        rel = float(
            jnp.max(jnp.abs(rec_f - rec_ref)) / jnp.max(jnp.abs(rec_ref))
        )
        print(f"{n_fft}/{hop} T={Tn}: kernel vs scan+istft rel={rel:.3e}",
              flush=True)

        def xla_path(m):
            ph = P.pghi_scan(m, gamma, n_fft, hop, tolerance=tol, key=key)
            return istft(m * expi(ph), n_fft, hop, dgt.inv_window)

        def fused_path(m):
            return pghi_invert_fused(
                m, gamma, n_fft, hop, dgt.inv_window, tolerance=tol,
                interpret=False,
            )

        dt_x = _device_time(xla_path, mag, N_ITER)
        print(f"  xla blocked+istft: {dt_x*1e3:.3f} ms "
              f"({frames/dt_x/1e6:.2f} M frames/s)", flush=True)
        dt_f = _device_time(fused_path, mag, N_ITER)
        print(f"  fused packed:      {dt_f*1e3:.3f} ms "
              f"({frames/dt_f/1e6:.2f} M frames/s)  [{dt_x/dt_f:.2f}x]",
              flush=True)


if __name__ == "__main__":
    main()
