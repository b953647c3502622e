"""Whole-session fused phaseless (RT-PGHI) roundtrip vs the generic scan.

The r3.20 kernel (ops/pallas/stream_step.py:_session_pghi_kernel) runs the
entire `[OverlapAdd, RealtimeSTFT(inversion_mode="pghi")]` session in one
pallas_call.  This sweep validates quality parity on-chip (spectral
convergence vs the true magnitudes — sample-level equality is the wrong
gate: the kernel's bf16x4 DFT vs the generic bf16x3 GEMM flips anchor
decisions at exact threshold boundaries) and times both paths.

Run (background, one TPU process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  PYTHONUNBUFFERED=1 timeout 1800 python tools/sweep_pghi_session.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import _device_time, _load_audio

CASES = [
    # (mode, n_fft, hop, chunk, batch)
    ("pghi", 1024, 256, 4096, 1),
    ("pghi", 1024, 256, 4096, 8),
    ("pghi", 1024, 256, 4096, 64),   # multi-stream serving fleet
    ("pghi", 1024, 256, 4096, 128),  # above the slab: two 64-stream slabs
    ("pghi", 1024, 256, 4096, 256),  # crossover probe (auto cap boundary)
    ("pghi", 512, 128, 2048, 1),
    ("pghi", 512, 64, 2048, 8),      # lcm-packed OLA (st=1)
    ("pghi_gl", 1024, 256, 4096, 1),
    ("pghi_gl", 1024, 256, 4096, 8),
    ("pghi_gl", 1024, 256, 4096, 16),  # auto cap (crossover is 16-32)
    ("pghi_gl", 1024, 256, 4096, 32),
    ("pghi_gl", 1024, 256, 4096, 64),  # GL auto cap boundary probe
    ("random", 1024, 256, 4096, 1),    # the reference's default rt mode
    ("random", 1024, 256, 4096, 8),
    ("random", 1024, 256, 4096, 64),   # auto cap (mirrors complex path)
    ("random", 512, 64, 2048, 8),      # lcm-packed OLA
    ("random", 1024, 256, 4096, 128),  # crossover probe (x3 GEMMs, 2 slabs)
    # bounded lookahead (r3.23): the quality knee is la=2 (BENCH_NOTES
    # r3.12); la=5 exercises the non-8-aligned fill row count
    ("pghi_gl", 1024, 256, 4096, 1, {"lookahead_frames": 2}),
    ("pghi_gl", 1024, 256, 4096, 8, {"lookahead_frames": 2}),
    ("pghi_gl", 1024, 256, 4096, 1, {"lookahead_frames": 5}),
]


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.streaming import scan_roundtrip

    x = _load_audio()
    print(f"device={jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)

    cases = CASES
    if len(sys.argv) > 1:  # rerun a subset: indices into CASES
        cases = [CASES[int(i)] for i in sys.argv[1:]]
    for case in cases:
        mode, n_fft, hop, chunk, B = case[:5]
        kw = case[5] if len(case) > 5 else {}
        ch = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
            n_fft=n_fft, hop_length=hop, inversion_mode=mode, **kw
        )
        L = (x.shape[-1] // chunk) * chunk
        xj = jnp.asarray(np.broadcast_to(x[:L], (B, L)).copy())
        st = T.STFT(n_fft=n_fft, hop_length=hop)
        delay = (n_fft // hop - 1) * hop
        # one row only (the batch rows are identical copies), and passed as
        # an ARGUMENT: a jit-captured constant ships inside the remote
        # compile request — 360 MB at B=256 trips the relay's HTTP 413
        ref_mag = jnp.abs(st.forward(xj[0, : L - delay]))

        @jax.jit
        def sc_of(y, ref):
            m = jnp.abs(st.forward(y[..., 0, delay:L]))
            n = min(m.shape[-2], ref.shape[-2]) - 2
            return jnp.linalg.norm(
                m[..., 2:n, :] - ref[..., 2:n, :]
            ) / jnp.linalg.norm(ref[..., 2:n, :])

        def gen(v):
            return scan_roundtrip(
                ch, v, chunk, inversion_mode=mode, key=key,
                backend="generic",
            )

        def fus(v):
            return scan_roundtrip(
                ch, v, chunk, inversion_mode=mode, key=key,
                backend="fused",
            )

        sc_g = float(sc_of(gen(xj), ref_mag))
        sc_f = float(sc_of(fus(xj), ref_mag))
        frames = B * L // hop
        dt_g = _device_time(gen, xj, 5)
        dt_f = _device_time(fus, xj, 10)
        tag = "".join(f" {k}={v}" for k, v in kw.items())
        print(
            f"{mode}{tag} {n_fft}/{hop} chunk={chunk} B={B}: "
            f"sc gen={sc_g:.4f} fused={sc_f:.4f}  "
            f"generic {frames/dt_g/1e3:.1f}K  fused {frames/dt_f/1e3:.1f}K "
            f"frames/s  [{dt_g/dt_f:.1f}x]",
            flush=True,
        )


if __name__ == "__main__":
    main()
