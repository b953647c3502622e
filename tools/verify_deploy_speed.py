"""Prove the deploy artifact keeps the Pallas kernel speed on TPU
(VERDICT r3 weak #7).

``export_stablehlo`` serializes whatever the traced function lowers to —
on TPU the fused forward lowers to a Mosaic ``tpu_custom_call``.  This
script measures, on the same chip:

  1. the live fused forward (the serving dispatch),
  2. the StableHLO-exported + reloaded artifact (deserialize -> call),
  3. the AOT recipe (``jit(fn).lower(x).compile()`` + the persistent
     compilation cache) — the supported fallback if (2) cannot carry the
     custom call.

and reports throughputs side by side.  BENCH_NOTES r4 records the verdict;
bench.py gained ``deployed_artifact_frames_per_sec`` gated on parity with
the live kernel.

Run on TPU: ``python tools/verify_deploy_speed.py``.
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

N_FFT, HOP, SR, B = 1024, 256, 44100, 128


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.export import export_stablehlo, load_stablehlo
    from acids_transforms_tpu.fuse import fuse_forward
    from bench import _device_time, _load_audio

    x = _load_audio()
    xb = jnp.asarray(np.broadcast_to(x, (B, x.shape[-1])).copy())
    chain = (
        T.STFT(n_fft=N_FFT, hop_length=HOP)
        + T.Magnitude(mode="unipolar", contrast="log1p", mel=True, n_fft=N_FFT)
    ).fit(xb)
    fused = fuse_forward(chain, backend="pallas")
    y_live = jax.jit(fused)(xb[:2])
    T_frames = int(y_live.shape[-2])
    frames = B * T_frames
    out = {"config": {"n_fft": N_FFT, "hop": HOP, "batch": B}}

    dt_live = _device_time(fused, xb, 100)
    out["live_kernel_frames_per_sec"] = round(frames / dt_live, 1)

    # --- StableHLO export/reload of the Mosaic custom call
    try:
        t0 = time.perf_counter()
        blob = export_stablehlo(fused, (xb,))
        out["export_s"] = round(time.perf_counter() - t0, 2)
        out["artifact_bytes"] = len(blob)
        restored = load_stablehlo(blob)
        # the artifact's signature is fixed at the export batch; compare
        # against the live kernel on the same full batch (max-abs on
        # device — complex transfers aside, big fetches crawl the tunnel)
        y_full = jax.jit(fused)(xb)
        y_r = jax.jit(restored)(xb)
        err = float(
            jnp.max(jnp.abs(y_r - y_full)) / (jnp.max(jnp.abs(y_full)) + 1e-12)
        )
        out["reload_rel_err"] = err
        dt_r = _device_time(restored, xb, 100)
        out["artifact_frames_per_sec"] = round(frames / dt_r, 1)
        out["artifact_vs_live"] = round((frames / dt_r) / (frames / dt_live), 3)
    except Exception as e:
        out["stablehlo_error"] = f"{type(e).__name__}: {e}"[:500]

    # --- AOT recipe: ahead-of-time compile + persistent cache
    try:
        t0 = time.perf_counter()
        compiled = jax.jit(fused).lower(xb).compile()
        out["aot_compile_s"] = round(time.perf_counter() - t0, 2)
        # a compiled executable cannot be re-traced: time a serial call
        # queue and force completion by fetching the last result
        compiled(xb)  # warm
        n = 50
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = None
            for _ in range(n):
                y = compiled(xb)
            float(jnp.mean(y))
            best = min(best, (time.perf_counter() - t0) / n)
        out["aot_frames_per_sec"] = round(frames / best, 1)
    except Exception as e:
        out["aot_error"] = f"{type(e).__name__}: {e}"[:500]

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
