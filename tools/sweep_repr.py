"""TPU probe of the fused two-channel representation kernel (r3.16).

Measures, at the headline shape and the DGT (full-K) shape, the Pallas
fused representation path vs the XLA fused path vs the chain, for
Polar / PolarIF / Cartesian — plus wrap-aware accuracy gates computed on
device (complex64 device->host is UNIMPLEMENTED over the tunnel, and raw
phase diffs alias by 2pi; we fetch real scalars only):

  mag_rel   = max|m_f - m_r| / max|m_r|          (channel 1)
  phase_circ= max w*|e^{i p_f} - e^{i p_r}|      (channel 2, w = |X|/max|X|,
              after inverting the representation back to phases)

Run:  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_repr.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import _device_time, _load_audio

N_ITER = 50


def _accuracy(chain, f, xb):
    """(mag_rel, phase_circ) between fuse_forward(f) and the chain, as
    python floats fetched from real-valued device scalars."""
    import jax
    import jax.numpy as jnp

    rep = chain.transforms[-1]

    @jax.jit
    def gates(x):
        y_r = chain.forward(x)
        y_f = f(x)
        ax = rep.stack
        m_r, p_r = jnp.take(y_r, 0, axis=ax), jnp.take(y_r, 1, axis=ax)
        m_f, p_f = jnp.take(y_f, 0, axis=ax), jnp.take(y_f, 1, axis=ax)
        mag_rel = jnp.max(jnp.abs(m_r - m_f)) / jnp.max(jnp.abs(m_r))
        from acids_transforms_tpu.transforms.spectral_repr import Cartesian

        if isinstance(rep, Cartesian):
            ch2 = jnp.max(jnp.abs(p_r - p_f)) / jnp.max(jnp.abs(p_r))
            return mag_rel, ch2
        pa = rep.phase.invert(p_r)
        pb = rep.phase.invert(p_f)
        mag = jnp.abs(rep.magnitude.invert(m_r))
        w = mag / jnp.max(mag)
        # |e^{ia} - e^{ib}| = 2|sin((a-b)/2)| — real arithmetic only
        circ = 2.0 * jnp.abs(jnp.sin(0.5 * (pa - pb)))
        return mag_rel, jnp.max(w * circ)

    a, b = gates(xb[:4])
    return float(a), float(b)


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.fuse import fuse_forward

    x = _load_audio()
    print(f"device={jax.devices()[0]}", flush=True)
    results = {}

    reps = {
        "polar": lambda n: T.Polar(magnitude_args={"mode": "bipolar", "n_fft": n}),
        "polarif": lambda n: T.PolarIF(magnitude_args={"mode": "bipolar", "n_fft": n}),
        "cartesian": lambda n: T.Cartesian(),
    }
    cases = [
        ("stft_1024_256_b128", "stft", 1024, 256, 128),
        ("dgt_1024_256_b128", "dgt", 1024, 256, 128),
        ("stft_512_128_b128", "stft", 512, 128, 128),
    ]
    for key, kind, n_fft, hop, batch in cases:
        xb = jnp.asarray(np.broadcast_to(x, (batch, x.shape[-1])).copy())
        spec_cls = T.DGT if kind == "dgt" else T.STFT
        T_frames = 1 + x.shape[-1] // hop
        frames = batch * T_frames
        for rkey, mk in reps.items():
            chain = (
                T.Mono() + spec_cls(n_fft=n_fft, hop_length=hop) + mk(n_fft)
            ).fit(xb[:2])
            row = {}
            for backend in ("pallas", "xla"):
                fn = fuse_forward(chain, backend)
                mag_rel, ch2 = _accuracy(chain, fn, xb)
                dt = _device_time(jax.jit(fn), xb, N_ITER)
                row[backend] = {
                    "frames_per_sec": round(frames / dt),
                    "ms": round(dt * 1e3, 3),
                    "mag_rel": mag_rel,
                    "ch2": ch2,
                }
            dt = _device_time(jax.jit(chain.jforward), xb, N_ITER)
            row["chain"] = {
                "frames_per_sec": round(frames / dt),
                "ms": round(dt * 1e3, 3),
            }
            row["pallas_over_xla"] = round(
                row["pallas"]["frames_per_sec"] / row["xla"]["frames_per_sec"], 3
            )
            results[f"{key}_{rkey}"] = row
            print(f"{key}_{rkey}", json.dumps(row), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()


