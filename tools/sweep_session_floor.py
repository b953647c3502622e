"""Floor analysis of the whole-session streaming kernels at B=1 (r4.6).

The r4.5 re-measure showed the complex session kernels win only at small
batch; this quantifies what bounds them THERE (the latency-sensitive
case auto serves).  Components measured on the same 4 s session:

  - encode-only kernel (scan_forward fused) and decode-only kernel
    (scan_invert fused) vs their sum and the fused roundtrip;
  - an XLA GEMM pair of the SAME total MACs as the session's analysis+
    synthesis (689x1024 @ 1024x1026 both directions, one dispatch) —
    the "no grid, no ring" compute reference;
  - the bench harness overhead (identity fn through _device_time).

Run on TPU: ``python tools/sweep_session_floor.py``.
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


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.ops.fft import matmul_precision
    from acids_transforms_tpu.streaming import (
        scan_forward,
        scan_invert,
        scan_roundtrip,
    )
    from bench import _device_time, _load_audio

    x = jnp.asarray(_load_audio())
    ch = T.OverlapAdd(N_FFT, HOP) + T.RealtimeSTFT(n_fft=N_FFT, hop_length=HOP)
    out = {}
    it = 50

    # harness overhead (identity): the input-carry copy + output reduce
    out["harness_ms"] = round(_device_time(lambda v: v * 1.0000001, x, it) * 1e3, 4)

    spec = scan_forward(ch, x, CHUNK, backend="generic")[0]
    T_frames = int(spec.shape[-2])
    Tm = (T_frames // (CHUNK // HOP)) * (CHUNK // HOP)
    out["frames"] = T_frames

    dt_rt = _device_time(
        lambda v: scan_roundtrip(ch, v, CHUNK, backend="fused"), x, it
    )
    out["roundtrip_ms"] = round(dt_rt * 1e3, 4)
    dt_enc = _device_time(
        lambda v: scan_forward(ch, v, CHUNK, backend="fused")[0], x, it
    )
    out["encode_ms"] = round(dt_enc * 1e3, 4)
    specm = spec[:Tm]
    dt_dec = _device_time(
        lambda v: scan_invert(ch, v, CHUNK // HOP, backend="fused"), specm, it
    )
    out["decode_ms"] = round(dt_dec * 1e3, 4)

    # same-MACs XLA GEMM pair, one dispatch (no grid steps, no ring):
    # frames @ (n_fft x 2F) analysis then spec2 @ (2F x n_fft) synthesis
    F2 = 2 * (N_FFT // 2 + 1)
    A = jnp.asarray(np.random.default_rng(0).standard_normal(
        (N_FFT, F2)).astype(np.float32))
    Bmat = jnp.asarray(np.random.default_rng(1).standard_normal(
        (F2, N_FFT)).astype(np.float32))
    frames = jnp.asarray(np.random.default_rng(2).standard_normal(
        (T_frames, N_FFT)).astype(np.float32))
    prec = matmul_precision()

    def gemm_pair(fr):
        s = jnp.matmul(fr, A, precision=prec)
        return jnp.matmul(s, Bmat, precision=prec)

    out["xla_gemm_pair_ms"] = round(_device_time(gemm_pair, frames, it) * 1e3, 4)
    out["grid_steps"] = -(-x.shape[-1] // CHUNK)
    out["net_roundtrip_ms"] = round((dt_rt - _device_time(
        lambda v: v * 1.0000001, x, it)) * 1e3, 4)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
