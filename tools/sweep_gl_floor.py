"""Stage budget of the fused Griffin-Lim iteration kernel (VERDICT r3
weak #5 — the r3.9 sweep_kernel_floor methodology applied to GL).

Measures the k=1 momentum-GL kernel at increasing stage prefixes
(ops/pallas/glstep.py ``stages=``), all with IDENTICAL operand specs and
grid, so each delta attributes one stage of the iteration:

  0  DMA floor: fetch mag/are/aim/tre/tim(+env) blocks, write 4 outputs
  1  + Y = mag*angles + synthesis taps conv (VPU rolls)
  2  + synthesis twiddle combine + synthesis GEMM + envelope divide
  3  + analysis GEMM + analysis twiddle combine
  4  + analysis taps conv (= full consistency projection)
  5  + momentum extrapolation + renormalization (the shipped kernel)

Also times the shipped k=4 chained kernel and the full gl dispatch
(``invert_without_phase``) for the bench-metric context.

Run on TPU: ``python tools/sweep_gl_floor.py`` (~2-4 s compiles per
variant since the r2 relay upgrade).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np

N_FFT, HOP, SR = 1024, 256, 44100
B, SECONDS = 8, 4.0
N_ITER_GL = 24  # the default GL iteration budget
TIMING_ITERS = 30


def _device_time(fn, args, iters=TIMING_ITERS):
    import jax
    import jax.numpy as jnp

    def many(a):
        def body(_, carry):
            a, acc = carry
            outs = fn(*a)
            s = sum(
                jnp.mean(jnp.abs(o).astype(jnp.float32))
                for o in (outs if isinstance(outs, tuple) else (outs,))
            )
            a = tuple(v + (1e-30 * s).astype(v.dtype) for v in a)
            return (a, acc + s)

        return jax.lax.fori_loop(0, iters, body, (a, jnp.zeros(())))[1]

    g = jax.jit(many)
    float(g(args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu.ops.fft import stft, taps_for_window
    from acids_transforms_tpu.ops.pallas.glstep import make_gl_momentum_step
    from acids_transforms_tpu.ops.windows import hann_window
    from bench import _load_audio

    x = _load_audio()
    xb = jnp.broadcast_to(jnp.asarray(x), (B, x.shape[-1]))
    window = hann_window(N_FFT)
    taps = taps_for_window(window)
    mag = jnp.abs(stft(xb, N_FFT, HOP, window))
    T, F = mag.shape[-2:]
    frames = B * T

    key = jax.random.PRNGKey(0)
    ang = jax.random.uniform(key, mag.shape, minval=-np.pi, maxval=np.pi)
    are0, aim0 = jnp.cos(ang), jnp.sin(ang)

    out = {"config": {"n_fft": N_FFT, "hop": HOP, "B": B, "T": int(T)}}
    rows = []
    stage_names = [
        "0 dma floor", "1 +taps_syn", "2 +syn_gemm/env",
        "3 +ana_gemm/combine", "4 +taps_ana (projection)",
        "5 +momentum/renorm (shipped k=1)",
    ]
    prev_ms = None
    for s in range(6):
        step, to_rows, _ = make_gl_momentum_step(
            mag, N_FFT, HOP, taps, window, 0.99, stages=s
        )
        a = to_rows(are0)
        b = to_rows(aim0)
        z = jnp.zeros_like(a)
        dt = _device_time(step, (a, b, z, z))
        ms = dt * 1e3
        rows.append({
            "stage": stage_names[s],
            "ms_per_iter": round(ms, 4),
            "delta_ms": round(ms - prev_ms, 4) if prev_ms is not None else None,
        })
        prev_ms = ms
    out["stages"] = rows

    # the shipped k=4 chain for per-iteration context
    step4, to_rows, _ = make_gl_momentum_step(
        mag, N_FFT, HOP, taps, window, 0.99, iters=4
    )
    a = to_rows(are0)
    z = jnp.zeros_like(a)
    dt4 = _device_time(step4, (a, to_rows(aim0), z, z))
    out["k4_ms_per_call"] = round(dt4 * 1e3, 4)
    out["k4_ms_per_iter"] = round(dt4 * 1e3 / 4, 4)
    out["k1_vs_k4_per_iter"] = round(prev_ms / (dt4 * 1e3 / 4), 3)

    # whole-dispatch context: 24-iter GL frames/s like the bench metric
    from acids_transforms_tpu import transforms as T_
    stft_gl = T_.STFT(n_fft=N_FFT, hop_length=HOP)
    dt_full = _device_time(
        lambda m: stft_gl.invert_without_phase(
            m, inversion_mode="griffin_lim"
        ),
        (mag,), iters=5,
    )
    out["gl24_frames_per_sec"] = round(frames / dt_full, 1)
    out["gl24_ms"] = round(dt_full * 1e3, 2)
    out["k4_iter_share_of_gl24"] = round(
        (N_ITER_GL / 4 * dt4 * 1e3) / (dt_full * 1e3), 3
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
