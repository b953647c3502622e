"""Fused invert-only (DECODE) sessions vs the generic ``scan_invert`` scan.

The r3.24 decode kernels (ops/pallas/stream_step.py invert-only section)
run the vocoder serving hot path — model magnitudes in, audio out — as one
pallas_call, sharing everything with the roundtrip session kernels except
the analysis GEMM.  This sweep validates quality parity on-chip (spectral
convergence vs the true magnitudes; sample-level equality is the wrong
gate — see sweep_pghi_session.py) and times both paths.

Run (background, one TPU process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  PYTHONUNBUFFERED=1 timeout 1800 python tools/sweep_invert_session.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import _device_time, _load_audio

CASES = [
    # (mode, n_fft, hop, chunk_frames, batch[, rt kwargs])
    ("pghi", 1024, 256, 16, 1),
    ("pghi", 1024, 256, 16, 8),
    ("pghi", 1024, 256, 16, 64),
    ("pghi_gl", 1024, 256, 16, 1),
    ("pghi_gl", 1024, 256, 16, 8),
    ("pghi_gl", 1024, 256, 16, 1, {"lookahead_frames": 2}),
    ("random", 1024, 256, 16, 1),
    ("random", 1024, 256, 16, 8),
    ("pghi", 512, 64, 32, 8),          # lcm-packed OLA
    # ENCODE sessions (audio -> complex frames, scan_forward)
    ("encode", 1024, 256, 16, 1),
    ("encode", 1024, 256, 16, 8),
    ("encode", 1024, 256, 16, 64),
    # FEATURE 3-chain roundtrips ([OverlapAdd, RealtimeSTFT, Magnitude]):
    # encode kernel + whole-session mel roundtrip + decode kernel
    ("feat_pghi", 1024, 256, 16, 1),
    ("feat_pghi", 1024, 256, 16, 8),
    # COMPLEX (explicit-phase) decode: synthesis+OLA only
    ("complex", 1024, 256, 16, 1),
    ("complex", 1024, 256, 16, 8),
    # SINEBANK decode: scan-free closed form (streaming._sinebank_session)
    ("sinebank", 1024, 256, 16, 1),
    ("sinebank", 1024, 256, 16, 8),
    ("sinebank", 1024, 256, 16, 64),
    # shape coverage + the gaussian-window (DGT) decode path
    ("pghi", 2048, 512, 8, 8),
    ("pghi", 512, 128, 16, 8),
    ("dgt_pghi", 1024, 256, 16, 1),
    ("dgt_pghi", 1024, 256, 16, 8),
]


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.streaming import scan_invert

    x = _load_audio()
    print(f"device={jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)

    cases = CASES
    if len(sys.argv) > 1:  # rerun a subset: indices into CASES
        cases = [CASES[int(i)] for i in sys.argv[1:]]
    for case in cases:
        mode, n_fft, hop, T_c, B = case[:5]
        kw = case[5] if len(case) > 5 else {}
        if mode == "encode":
            from acids_transforms_tpu.streaming import scan_forward

            ch = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
                n_fft=n_fft, hop_length=hop
            )
            chunk = T_c * hop
            L = (x.shape[-1] // chunk) * chunk
            xj = jnp.asarray(np.broadcast_to(x[:L], (B, L)).copy())

            def genf(v):
                y, _ = scan_forward(ch, v, chunk, backend="generic")
                return jnp.abs(y)  # complex -> real for the timing fetch

            def fusf(v):
                y, _ = scan_forward(ch, v, chunk, backend="fused")
                return jnp.abs(y)

            rel = float(
                jnp.max(jnp.abs(genf(xj) - fusf(xj)))
                / (jnp.max(jnp.abs(genf(xj))) + 1e-9)
            )
            frames = B * L // hop
            dt_g = _device_time(genf, xj, 5)
            dt_f = _device_time(fusf, xj, 10)
            print(
                f"encode {n_fft}/{hop} T_c={T_c} B={B}: |mag| rel={rel:.2e}  "
                f"generic {frames/dt_g/1e3:.1f}K  fused {frames/dt_f/1e3:.1f}K"
                f" frames/s  [{dt_g/dt_f:.1f}x]",
                flush=True,
            )
            continue
        if mode == "complex":
            from acids_transforms_tpu.streaming import (
                scan_forward,
                scan_invert,
            )

            ch = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
                n_fft=n_fft, hop_length=hop
            )
            chunk = T_c * hop
            L = (x.shape[-1] // chunk) * chunk
            xj = jnp.asarray(np.broadcast_to(x[:L], (B, L)).copy())
            spec, _ = scan_forward(ch, xj, chunk, backend="generic")

            def genc(v):
                return scan_invert(ch, v, T_c, backend="generic")

            def fusc(v):
                return scan_invert(ch, v, T_c, backend="fused")

            rel = float(
                jnp.max(jnp.abs(genc(spec) - fusc(spec)))
                / (jnp.max(jnp.abs(genc(spec))) + 1e-9)
            )
            frames = B * L // hop
            dt_g = _device_time(genc, spec, 5)
            dt_f = _device_time(fusc, spec, 10)
            print(
                f"complex {n_fft}/{hop} T_c={T_c} B={B}: rel={rel:.2e}  "
                f"generic {frames/dt_g/1e3:.1f}K  fused {frames/dt_f/1e3:.1f}K"
                f" frames/s  [{dt_g/dt_f:.1f}x]",
                flush=True,
            )
            continue
        if mode.startswith("feat_"):
            from acids_transforms_tpu.streaming import scan_roundtrip

            rt_mode = mode[5:]
            ch = (
                T.OverlapAdd(n_fft, hop)
                + T.RealtimeSTFT(
                    n_fft=n_fft, hop_length=hop, inversion_mode=rt_mode, **kw
                )
                + T.Magnitude(mode=None, contrast="log1p", mel=True,
                              n_fft=n_fft)
            )
            chunk = T_c * hop
            L = (x.shape[-1] // chunk) * chunk
            xj = jnp.asarray(np.broadcast_to(x[:L], (B, L)).copy())
            st = T.STFT(n_fft=n_fft, hop_length=hop)
            delay = (n_fft // hop - 1) * hop
            ref_mag = jnp.abs(st.forward(xj[0, : L - delay]))

            @jax.jit
            def sc_of3(y, ref):
                m = jnp.abs(st.forward(y[..., 0, delay:L]))
                n = min(m.shape[-2], ref.shape[-2]) - 2
                return jnp.linalg.norm(
                    m[..., 2:n, :] - ref[..., 2:n, :]
                ) / jnp.linalg.norm(ref[..., 2:n, :])

            def gen3(v):
                return scan_roundtrip(
                    ch, v, chunk, inversion_mode=rt_mode, key=key,
                    backend="generic",
                )

            def fus3(v):
                return scan_roundtrip(
                    ch, v, chunk, inversion_mode=rt_mode, key=key,
                    backend="fused",
                )

            sc_g = float(sc_of3(gen3(xj), ref_mag))
            sc_f = float(sc_of3(fus3(xj), ref_mag))
            frames = B * L // hop
            dt_g = _device_time(gen3, xj, 5)
            dt_f = _device_time(fus3, xj, 10)
            print(
                f"{mode} 1024/256 T_c={T_c} B={B}: "
                f"sc gen={sc_g:.4f} fused={sc_f:.4f}  "
                f"generic {frames/dt_g/1e3:.1f}K  fused {frames/dt_f/1e3:.1f}K"
                f" frames/s  [{dt_g/dt_f:.1f}x]",
                flush=True,
            )
            continue
        if mode.startswith("dgt_"):
            rt_mode = mode[4:]
            ch = T.OverlapAdd(n_fft, hop) + T.RealtimeDGT(
                n_fft=n_fft, hop_length=hop, inversion_mode=rt_mode, **kw
            )
            mode = rt_mode
            tag0 = "dgt_"
        else:
            ch = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
                n_fft=n_fft, hop_length=hop, inversion_mode=mode, **kw
            )
            tag0 = ""
        chunk = T_c * hop
        L = (x.shape[-1] // chunk) * chunk
        st = T.STFT(n_fft=n_fft, hop_length=hop)
        # model-output stand-in: the true magnitudes, frame-major
        mag1 = jnp.abs(st.forward(jnp.asarray(x[:L])))
        n_frames = (mag1.shape[-2] // T_c) * T_c
        mags = jnp.broadcast_to(
            mag1[:n_frames], (B, n_frames, mag1.shape[-1])
        ).copy() if B > 1 else mag1[None, :n_frames]
        ref_mag = mag1[:n_frames]

        @jax.jit
        def sc_of(y, ref):
            m = jnp.abs(st.forward(y[..., 0, :]))
            n = min(m.shape[-2], ref.shape[-2]) - 2
            return jnp.linalg.norm(
                m[..., 2:n, :] - ref[..., 2:n, :]
            ) / jnp.linalg.norm(ref[..., 2:n, :])

        def gen(v):
            return scan_invert(
                ch, v, T_c, inversion_mode=mode, key=key, backend="generic"
            )

        def fus(v):
            return scan_invert(
                ch, v, T_c, inversion_mode=mode, key=key, backend="fused"
            )

        sc_g = float(sc_of(gen(mags), ref_mag))
        sc_f = float(sc_of(fus(mags), ref_mag))
        frames = B * n_frames
        dt_g = _device_time(gen, mags, 5)
        dt_f = _device_time(fus, mags, 10)
        tag = "".join(f" {k}={v}" for k, v in kw.items())
        print(
            f"{tag0}{mode}{tag} {n_fft}/{hop} T_c={T_c} B={B}: "
            f"sc gen={sc_g:.4f} fused={sc_f:.4f}  "
            f"generic {frames/dt_g/1e3:.1f}K  fused {frames/dt_f/1e3:.1f}K "
            f"frames/s  [{dt_g/dt_f:.1f}x]",
            flush=True,
        )


if __name__ == "__main__":
    main()
