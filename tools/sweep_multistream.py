"""Concurrent-stream throughput of the fused whole-session roundtrip kernel.

N realtime sessions (OverlapAdd + RealtimeSTFT, chunk 4096) ride ONE
kernel; the grid-step frame count scales down with batch so per-step VMEM
stays bounded (B*T_k <= 1024 — B=32 at the fixed 128-frame step OOM'd
scoped VMEM).  Measured r3.9 (v5e): B=1/8/16/32/64 ->
0.30/1.83/3.07/4.35/5.71 M frames/s = 1.7k/10.6k/17.8k/25.3k/33.2k x
realtime.  See BENCH_NOTES.md "multi-stream serving".

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_multistream.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import HOP, N_FFT, _device_time, _load_audio


def main():
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.streaming import scan_roundtrip

    x = _load_audio()
    L = (x.shape[-1] // 4096) * 4096
    chain = T.OverlapAdd(N_FFT, HOP) + T.RealtimeSTFT(n_fft=N_FFT, hop_length=HOP)
    for B in (1, 8, 16, 32, 64):
        xb = jnp.asarray(np.broadcast_to(x[:L], (B, L)).copy())
        dt = _device_time(lambda v: scan_roundtrip(chain, v, 4096), xb, 10)
        fps = B * L / HOP / dt
        rt = B * (L / 44100) / dt
        print(
            f"B={B:3d}: {dt*1e3:7.2f} ms per {L/44100:.1f}s batch  "
            f"{fps/1e3:8.1f} K frames/s  {rt:8.0f}x realtime",
            flush=True,
        )


if __name__ == "__main__":
    main()
