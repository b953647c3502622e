"""Benchmark harness: batched STFT -> mel frames/sec per chip vs torch-CPU.

Measures BASELINE config 1+3 (Mono + STFT + Magnitude(mel=True, log1p,
unipolar norm) on additive.wav-like material): the jitted TPU pipeline
against the equivalent torch-CPU pipeline (torchaudio is not available in
this image, so the oracle is the same math in torch ops — what
torchaudio.transforms.MelSpectrogram does internally).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_FFT = 1024
HOP = 256
SR = 44100
SECONDS = 4.0
TPU_BATCH = 64
CPU_BATCH = 4
N_ITER_TPU = 200
N_ITER_CPU = 3


def _load_audio() -> np.ndarray:
    """additive.wav from the reference corpus (read-only at runtime), else a
    synthetic additive signal with the same character."""
    path = "/root/reference/test/source_files/additive.wav"
    L = int(SR * SECONDS)
    try:
        from acids_transforms_tpu.utils.misc import import_data

        x, _ = import_data(path, sr=SR)
        x = x.mean(0)
        reps = -(-L // x.shape[-1])
        return np.tile(x, reps)[:L].astype(np.float32)
    except Exception:
        t = np.arange(L) / SR
        x = sum(
            np.sin(2 * np.pi * f * t) / (i + 1)
            for i, f in enumerate([220, 440, 660, 880])
        )
        return (0.5 * x / np.abs(x).max()).astype(np.float32)


def bench_tpu(x: np.ndarray):
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T

    xb = jnp.asarray(np.broadcast_to(x, (TPU_BATCH, x.shape[-1])).copy())
    chain = T.Mono() + T.STFT(n_fft=N_FFT, hop_length=HOP) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=N_FFT
    )
    chain = chain.fit(xb)

    # run N_ITER_TPU pipeline executions *on device* inside one jitted
    # fori_loop, with a vanishing data dependency between iterations so XLA
    # cannot hoist the loop-invariant work — immune to async-dispatch timing
    # artifacts over the device tunnel.
    def many(c, v):
        def body(_, carry):
            v, acc = carry
            y = c.forward(v)
            s = jnp.mean(y)
            return (v + 1e-30 * s, acc + s)

        v, acc = jax.lax.fori_loop(0, N_ITER_TPU, body, (v, jnp.zeros(())))
        return acc

    run = jax.jit(many)
    float(run(chain, xb))  # compile + warm (value fetch forces completion;
    # block_until_ready does not reliably wait over the device tunnel)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(chain, xb))
        best = min(best, time.perf_counter() - t0)
    dt = best / N_ITER_TPU

    y = jax.jit(lambda c, v: c.forward(v))(chain, xb)
    frames = TPU_BATCH * y.shape[-2]
    fps = frames / dt

    # round-trip correctness on the exact inversion path (keep_input phase)
    stft_t = T.STFT(n_fft=N_FFT, hop_length=HOP)
    spec = stft_t.forward(xb[:2])
    rec = np.asarray(stft_t.invert(spec))
    n = rec.shape[-1]
    ref = np.asarray(xb[:2])[..., :n]
    rel_err = float(np.abs(rec - ref).max() / np.abs(ref).max())
    return fps, rel_err, str(jax.devices()[0]).strip()


def bench_torch_cpu(x: np.ndarray):
    import torch

    from acids_transforms_tpu.ops.mel import square_mel_banks

    torch.set_num_threads(os.cpu_count() or 1)
    xb = torch.from_numpy(np.broadcast_to(x, (CPU_BATCH, x.shape[-1])).copy())
    w = torch.hann_window(N_FFT)
    fwd_bank, _ = square_mel_banks(N_FFT, SR)
    bank = torch.from_numpy(fwd_bank)
    offset, scale = 0.1, 2.3

    def run():
        spec = torch.stft(xb, N_FFT, HOP, window=w, return_complex=True, onesided=True)
        mag = spec.abs().transpose(-2, -1)
        mel = mag @ bank
        out = (torch.log1p(mel) - offset) / scale
        return out

    y = run()  # warm
    t0 = time.perf_counter()
    for _ in range(N_ITER_CPU):
        y = run()
    dt = (time.perf_counter() - t0) / N_ITER_CPU
    frames = CPU_BATCH * y.shape[-2]
    return frames / dt


def main():
    x = _load_audio()
    fps_tpu, rel_err, device = bench_tpu(x)
    fps_cpu = bench_torch_cpu(x)
    result = {
        "metric": "Batched STFT→mel frames/sec per chip",
        "value": round(fps_tpu, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps_tpu / fps_cpu, 2),
        "torch_cpu_frames_per_sec": round(fps_cpu, 1),
        "roundtrip_rel_err": rel_err,
        "device": device,
        "config": {
            "n_fft": N_FFT,
            "hop": HOP,
            "batch": TPU_BATCH,
            "seconds": SECONDS,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
