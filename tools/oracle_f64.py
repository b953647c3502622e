"""float64-oracle accuracy probe for the fused mel-spectrogram paths.

For each (n_fft, hop) case, builds the torch-convention log1p mel pipeline
in numpy float64 (centre reflect pad + windowed rfft + square mel bank) and
scores, against it:

  * the fused Pallas kernel (chunk-factored, bf16x3 and the x4 4-product
    split — the n_fft >= 4096 accuracy region, fuse.py),
  * the XLA chain formulation (GEMM-DFT at ``matmul_precision()``).

This is the measurement behind the BENCH_NOTES.md "4096 accuracy region"
entry: at 4096/512 the x4 kernel (1.05e-4) lands *more* accurate than the
XLA chain itself (1.50e-4) on this metric — the relative norm is shrunk by
the log contrast; the absolute floor is f32 combine arithmetic, not GEMM
precision.  Runs on TPU (compiled kernel) or CPU (interpret mode).

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/oracle_f64.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import _load_audio

CASES = [(1024, 256), (2048, 512), (4096, 1024), (4096, 512)]


def oracle(xb, n_fft, hop, bank64, w64):
    half = n_fft // 2
    xp = np.pad(xb.astype(np.float64), [(0, 0), (half, half)], mode="reflect")
    T = 1 + xb.shape[-1] // hop
    frames = np.stack(
        [xp[:, i * hop: i * hop + n_fft] for i in range(T)], axis=1
    )
    mag = np.abs(np.fft.rfft(frames * w64[None, None, :], axis=-1))
    return np.log1p(mag @ bank64), T


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu.ops.fft import (
        matmul_precision,
        stft_real,
        taps_for_window,
    )
    from acids_transforms_tpu.ops.mel import square_mel_banks
    from acids_transforms_tpu.ops.pallas.spectral import (
        fused_melspec,
        mel_block_structure,
    )
    from acids_transforms_tpu.ops.windows import hann_window

    x = _load_audio()
    xb = np.broadcast_to(x, (4, x.shape[-1])).copy().astype(np.float32)
    print(f"device={jax.devices()[0]}", flush=True)

    for n_fft, hop in CASES:
        w = hann_window(n_fft)
        w64 = np.asarray(w, np.float64)
        taps = taps_for_window(w)
        fwd, _ = square_mel_banks(n_fft, sr=44100)
        bank64 = np.asarray(fwd, np.float64)
        blocks = mel_block_structure(fwd)
        ref, T = oracle(xb, n_fft, hop, bank64, w64)
        den = np.linalg.norm(ref)

        rows = {}
        for label, x4 in (("kernel_x3", False), ("kernel_x4", True)):
            y = np.asarray(jax.device_get(fused_melspec(
                jnp.asarray(xb), n_fft, hop, w, jnp.asarray(fwd),
                contrast="log1p", taps=taps, mel_blocks=blocks, x4=x4,
            )))[:, :T, : ref.shape[-1]]
            rows[label] = np.linalg.norm(y - ref) / den

        @jax.jit
        def xla_path(v, _w=w, _n=n_fft, _h=hop, _b=jnp.asarray(fwd)):
            re, im = stft_real(v, _n, _h, _w)
            mag = jnp.sqrt(jnp.maximum(
                re * re + im * im, jnp.finfo(jnp.float32).tiny))
            return jnp.log1p(
                jnp.matmul(mag, _b, precision=matmul_precision()))

        y = np.asarray(jax.device_get(xla_path(jnp.asarray(xb))))[
            :, :T, : ref.shape[-1]]
        rows["xla_chain"] = np.linalg.norm(y - ref) / den
        print(
            f"{n_fft}/{hop}: "
            + "  ".join(f"{k}={v:.3e}" for k, v in rows.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
