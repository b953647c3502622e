"""Probe: Mosaic kernels under shard_map on the REAL TPU, 1-device mesh.

The one untested link in the multi-chip contract (VERDICT r4 weak #1):
every shard_map leg so far ran interpret-mode on the CPU mesh, so the
`tpu_custom_call` + SPMD-partitioner combination that multi-chip serving
would execute had never been compiled anywhere.  A 1-device mesh on the
real chip goes through the same shard_map lowering path — this probe
compiles and runs each mesh leg on-chip and checks value parity with the
unmeshed dispatch plus the no-collective contract on the compiled HLO.

Run on the TPU env (background, generous timeout):
    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
        python tools/probe_mesh1_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.fuse import fuse_fit, fuse_forward
    from acids_transforms_tpu.parallel import make_mesh
    from acids_transforms_tpu.streaming import scan_invert, scan_roundtrip
    from acids_transforms_tpu.utils.hlo import collective_violations

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    on_tpu = dev.platform not in ("cpu",)
    print("platform:", dev.platform, "on_tpu:", on_tpu, flush=True)

    N_FFT, HOP, SR = 1024, 256, 44100
    L = 4 * SR
    rng = np.random.default_rng(0)
    t = np.arange(L) / SR
    x = sum(np.sin(2 * np.pi * f * t) / (i + 1)
            for i, f in enumerate([220, 440, 660, 880]))
    x = (0.5 * x / np.abs(x).max()).astype(np.float32)
    B = 8
    xb = jnp.asarray(np.broadcast_to(x, (B, L)).copy())

    mesh1 = make_mesh({"data": 1}, jax.devices()[:1])

    def fetch_rel(a, b):
        return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))

    # ---- 1. fused forward (the headline Pallas kernel) under shard_map
    chain = T.Mono() + T.STFT(n_fft=N_FFT, hop_length=HOP) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=N_FFT
    )
    chain = chain.fit(xb)
    f0 = fuse_forward(chain, backend="pallas")
    t0 = time.time()
    y0 = jax.jit(f0)(xb)
    print("unmeshed fused compiled+ran in %.1fs" % (time.time() - t0), flush=True)

    fm = fuse_forward(chain, backend="pallas", mesh=mesh1)
    t0 = time.time()
    ym = fm(xb)
    rel = fetch_rel(ym, y0)
    print("mesh1 fused compiled+ran in %.1fs rel=%.2e" % (time.time() - t0, rel),
          flush=True)
    txt = jax.jit(fm).lower(xb).compile().as_text()
    has_custom = "tpu_custom_call" in txt or "custom-call" in txt
    viol = collective_violations(txt)
    print("mesh1 fused: custom-call-present=%s collectives=%s" % (has_custom, viol),
          flush=True)
    assert rel < 1e-4, rel
    assert not viol, viol
    if on_tpu:
        assert has_custom, "no custom call in mesh1 module — kernel not riding shard_map?"

    # ---- 2. fused fit under shard_map (stats kernel + scalar combine)
    unfit = T.Mono() + T.STFT(n_fft=N_FFT, hop_length=HOP) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=N_FFT
    )
    ff0 = fuse_fit(unfit, backend="pallas")
    ffm = fuse_fit(unfit, backend="pallas", mesh=mesh1)

    def fit_scalars(f):
        c = f(xb)
        return np.asarray([float(c[-1].norm.offset), float(c[-1].norm.scale)])

    s0, sm = fit_scalars(ff0), fit_scalars(ffm)
    print("fit scalars unmeshed=%s mesh1=%s" % (s0, sm), flush=True)
    assert np.allclose(s0, sm, rtol=1e-5), (s0, sm)

    # ---- 3. whole-session streaming kernels under shard_map.
    # Value parity on the DETERMINISTIC complex roundtrip (the keyed
    # phaseless legs fold the shard index into the PRNG key by contract
    # — quality-equivalent, not bit-equal, PARITY.md); phaseless legs are
    # gated on spectral convergence instead.
    rt_c = T.OverlapAdd(N_FFT, HOP) + T.RealtimeSTFT(
        n_fft=N_FFT, hop_length=HOP
    )
    Lc = (L // 4096) * 4096
    xs = xb[..., :Lc]
    kp = jax.random.PRNGKey(0)
    t0 = time.time()
    y_rt0 = scan_roundtrip(rt_c, xs, 4096, backend="fused")
    y_rtm = scan_roundtrip(rt_c, xs, 4096, backend="fused", mesh=mesh1)
    rel_rt = fetch_rel(y_rtm, y_rt0)
    print("mesh1 session roundtrip in %.1fs rel=%.2e" % (time.time() - t0, rel_rt),
          flush=True)
    txt_rt = scan_roundtrip.lower(
        rt_c, xs, 4096, backend="fused", mesh=mesh1,
    ).compile().as_text()
    viol_rt = collective_violations(txt_rt)
    assert not viol_rt, viol_rt
    assert rel_rt < 1e-4, rel_rt

    # phaseless decode leg: SC parity vs the unmeshed kernel
    rt = T.OverlapAdd(N_FFT, HOP) + T.RealtimeSTFT(
        n_fft=N_FFT, hop_length=HOP, inversion_mode="pghi"
    )
    st_q = T.STFT(n_fft=N_FFT, hop_length=HOP)
    mags = jnp.abs(st_q.forward(xs))
    Tm = (mags.shape[-2] // (4096 // HOP)) * (4096 // HOP)
    mags = mags[..., :Tm, :]
    dec_delay = N_FFT // 2

    @jax.jit
    def sc_dec(y):
        m = jnp.abs(st_q.forward(y[..., dec_delay:]))
        n = min(int(m.shape[-2]), Tm) - 4
        return jnp.linalg.norm(
            m[..., 2:n, :] - mags[..., 2:n, :]
        ) / jnp.linalg.norm(mags[..., 2:n, :])

    y_d0 = scan_invert(rt, mags, 4096 // HOP, inversion_mode="pghi", key=kp,
                       backend="fused")
    y_dm = scan_invert(rt, mags, 4096 // HOP, inversion_mode="pghi", key=kp,
                       backend="fused", mesh=mesh1)
    sc0, scm = float(sc_dec(y_d0)), float(sc_dec(y_dm))
    print("mesh1 session decode SC unmeshed=%.4f mesh1=%.4f" % (sc0, scm),
          flush=True)
    assert scm <= sc0 * 1.1 + 1e-3, (sc0, scm)

    # ---- 4. quick timing: mesh-vs-unmeshed throughput ratio
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib
    bench = importlib.import_module("bench")
    dt0 = bench._device_time(f0, xb, 50)
    dtm = bench._device_time(fm, xb, 50)
    print("fused forward: unmeshed %.3f ms  mesh1 %.3f ms  ratio %.3f"
          % (dt0 * 1e3, dtm * 1e3, dt0 / dtm), flush=True)
    print("PROBE OK", flush=True)


if __name__ == "__main__":
    main()
