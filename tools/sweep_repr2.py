"""TPU probe #2 for the fused representation kernel: the x4 accuracy
variant at the winning shapes, plus the untested 2048/512 region.

sweep_repr.py found the x1 (3-product bf16) kernel's magnitude channel at
1.0-1.5e-4 vs the chain under *bipolar* normalization (the same ~5e-5 raw
error as the magnitude kernel, amplified ~2x because bipolar divides by
half the range).  The x4 split should halve it back under the 1e-4 budget;
this sweep prices it at the win shapes and fills in 2048/512.

Run:  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_repr2.py
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
    from acids_transforms_tpu.ops.pallas.spectral import fused_spectral_repr

    x = _load_audio()
    print(f"device={jax.devices()[0]}", flush=True)
    results = {}

    # (key, kind, n_fft, hop, batch, second, x4 list)
    cases = [
        ("stft_1024_256_polar", "stft", 1024, 256, 128, "phase", (False, True)),
        ("stft_1024_256_if", "stft", 1024, 256, 128, "if", (False, True)),
        ("dgt_1024_256_if", "dgt", 1024, 256, 128, "if", (False, True)),
        ("stft_512_128_if", "stft", 512, 128, 128, "if", (False, True)),
        ("stft_2048_512_polar", "stft", 2048, 512, 64, "phase", (False, True)),
        ("stft_2048_512_if", "stft", 2048, 512, 64, "if", (False, True)),
        ("stft_2048_512_cart", "stft", 2048, 512, 64, "imag", (False,)),
        ("stft_1024_256_cart", "stft", 1024, 256, 128, "imag", (False,)),
    ]
    if "--4096" in sys.argv:
        # the last unmeasured auto-region corner: taps 4096 (the forward
        # melspec auto accepts it with the x4 split — does the two-channel
        # kernel's extra phase DMA keep the win?)
        cases = [
            ("stft_4096_1024_polar", "stft", 4096, 1024, 32, "phase", (True,)),
            ("stft_4096_1024_if", "stft", 4096, 1024, 32, "if", (True,)),
            ("stft_4096_1024_cart", "stft", 4096, 1024, 32, "imag", (False,)),
        ]
    rep_mk = {
        "phase": lambda n: T.Polar(magnitude_args={"mode": "bipolar", "n_fft": n}),
        "if": lambda n: T.PolarIF(magnitude_args={"mode": "bipolar", "n_fft": n}),
        "imag": lambda n: T.Cartesian(),
    }
    for key, kind, n_fft, hop, batch, second, x4s in cases:
        xb = jnp.asarray(np.broadcast_to(x, (batch, x.shape[-1])).copy())
        spec_cls = T.DGT if kind == "dgt" else T.STFT
        st = spec_cls(n_fft=n_fft, hop_length=hop)
        chain = (T.Mono() + st + rep_mk[second](n_fft)).fit(xb[:2])
        rep = chain.transforms[-1]
        T_frames = 1 + x.shape[-1] // hop
        frames = batch * T_frames
        taps = getattr(st, "_window_taps", None)
        mag_t = rep.magnitude if second != "imag" else None

        def make_fn(x4):
            def fn(v):
                v = chain.transforms[0].forward(v)
                if second == "imag":
                    aff = (0.0, 1.0, 0.0, 1.0)
                    bank, contrast = None, "none"
                else:
                    aff = (
                        mag_t.norm.offset, mag_t.norm.scale,
                        rep.phase.norm.offset, rep.phase.norm.scale,
                    )
                    bank = mag_t.mel_bank if mag_t.mel else None
                    contrast = mag_t.contrast_mode or "none"
                y1, y2 = fused_spectral_repr(
                    v, n_fft, hop, st.window, second,
                    mel_bank=bank, aff=aff, contrast=contrast,
                    taps=taps, x4=x4,
                )
                return jnp.stack([y1, y2], axis=-2)
            return fn

        row = {}
        for x4 in x4s:
            fn = make_fn(x4)

            @jax.jit
            def gates(v):
                y_r = chain.forward(v)
                y_f = fn(v)
                m_r = jnp.take(y_r, 0, axis=-2)
                m_f = jnp.take(y_f, 0, axis=-2)
                return jnp.max(jnp.abs(m_r - m_f)) / jnp.max(jnp.abs(m_r))

            rel = float(gates(xb[:4]))
            dt = _device_time(jax.jit(fn), xb, N_ITER)
            row["x4" if x4 else "x1"] = {
                "frames_per_sec": round(frames / dt),
                "ms": round(dt * 1e3, 3),
                "mag_rel": rel,
            }
        dt = _device_time(jax.jit(chain.jforward), xb, N_ITER)
        row["chain"] = {"frames_per_sec": round(frames / dt)}
        xfn = fuse_forward(chain, "xla")
        dt = _device_time(jax.jit(xfn), xb, N_ITER)
        row["xla_fused"] = {"frames_per_sec": round(frames / dt)}
        for k in ("x1", "x4"):
            if k in row:
                row[f"{k}_over_xla"] = round(
                    row[k]["frames_per_sec"]
                    / row["xla_fused"]["frames_per_sec"], 3,
                )
        results[key] = row
        print(key, json.dumps(row), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
