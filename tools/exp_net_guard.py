"""Prove the net-session guard trips on a real kernel slowdown.

VERDICT r4 weak #2 "done" condition: a deliberate ~20% slowdown injected
into the session path must trip the new `session_net_ms_per_4s_b1` guard
(±15% band), while cross-process tenancy noise must not.  This measures:

  1. net session cost (harness-subtracted), normal dispatch — run this
     script twice in separate processes to sample the cross-process band;
  2. the same net with ~20% extra session work injected (a second fused
     session invocation over a 20%-length prefix, data-dependent so XLA
     cannot eliminate it);
  3. the guard decision `_delta_check` would make for (2) vs (1).

Run on TPU: ``python tools/exp_net_guard.py``.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

N_FFT, HOP, CHUNK = 1024, 256, 4096


def main():
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.streaming import scan_roundtrip
    from bench import _device_time, _load_audio

    x = jnp.asarray(_load_audio())
    L = (x.shape[-1] // CHUNK) * CHUNK
    x = x[:L]
    ch = T.OverlapAdd(N_FFT, HOP) + T.RealtimeSTFT(n_fft=N_FFT, hop_length=HOP)
    it = 100

    def net(fn):
        dt_h = _device_time(lambda v: v * 1.0000001, x, it)
        dt = _device_time(fn, x, it)
        return (dt - dt_h) * 1e3

    normal = net(lambda v: scan_roundtrip(ch, v, CHUNK, backend="fused"))

    # ~20% extra work: a second fused session over the 20%-length prefix,
    # folded in with a vanishing data dependency
    L5 = max(CHUNK, (L // 5 // CHUNK) * CHUNK)

    def slowed(v):
        y = scan_roundtrip(ch, v, CHUNK, backend="fused")
        y2 = scan_roundtrip(ch, v[..., :L5], CHUNK, backend="fused")
        return y.at[..., :L5].add(1e-30 * y2)

    injected = net(slowed)

    pct = 100.0 * (injected - normal) / abs(normal)
    out = {
        "net_normal_ms": round(normal, 4),
        "net_injected_ms": round(injected, 4),
        "rise_pct": round(pct, 1),
        "guard_trips": bool(pct > 15.0),
        "extra_work_frac": round(L5 / L, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
