"""Spot-validate the dispatch-region batch crossovers on-chip (r4).

The caps in dispatch_regions.json carry r3 measurements; this re-runs
the A/B at the crossover batches on the current tree so a compiler or
kernel change that moves a crossover is caught by measurement, not just
by the CPU conformance matrix.  For each mode at its cap batch B_cap and
the next step up, measure fused vs generic scan_roundtrip and report the
ratio (>= ~1 inside the region, <= ~1 just outside).

Run on TPU: ``python tools/sweep_region_check.py``.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np

N_FFT, HOP, CHUNK = 1024, 256, 4096
SECONDS = 2.0


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.streaming import scan_roundtrip
    from bench import _device_time, _load_audio

    x = _load_audio()[: int(44100 * SECONDS)]
    kp = jax.random.PRNGKey(0)
    out = {}
    cases = [
        # (mode, [B at cap, B beyond cap])
        (None, [64, 128]),
        ("pghi_gl", [32, 64]),
        ("random", [128, 256]),
        ("pghi", [256, None]),  # uncapped: just confirm the win persists
    ]
    for mode, batches in cases:
        ch = T.OverlapAdd(N_FFT, HOP) + T.RealtimeSTFT(
            n_fft=N_FFT, hop_length=HOP,
            **({"inversion_mode": mode} if mode else {}),
        )
        for B in batches:
            if B is None:
                continue
            xb = jnp.broadcast_to(jnp.asarray(x), (B, x.shape[-1]))
            iters = max(3, 40 // max(1, B // 8))
            dt_f = _device_time(
                lambda v: scan_roundtrip(
                    ch, v, CHUNK, inversion_mode=mode, key=kp,
                    backend="fused",
                ),
                xb, iters,
            )
            dt_g = _device_time(
                lambda v: scan_roundtrip(
                    ch, v, CHUNK, inversion_mode=mode, key=kp,
                    backend="generic",
                ),
                xb, iters,
            )
            out[f"{mode or 'complex'}_B{B}_fused_over_generic"] = round(
                dt_g / dt_f, 3
            )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
