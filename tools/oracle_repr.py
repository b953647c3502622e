"""float64-oracle accuracy probe for the fused representation kernel.

The magnitude channel of ``fused_spectral_repr`` is the already-validated
mel pipeline (tools/oracle_f64.py); the NEW math is the phase channel
(in-kernel octant atan2) and the frame-local IF stencil.  This probe
scores kernel and XLA chain against a float64 reference:

  * ``phase``: magnitude-weighted circular distance
    ``max w |e^{i p} - e^{i p64}|`` with ``w = |X64|/max|X64|`` —
    wrap-safe, and weighs out quiet bins whose phase is noise amplified
    by 1/|X| in ANY f32 backend.
  * ``if``: same metric on the re-integrated phase (`fint_forward` of the
    IF channel), which is what inversion consumes.
  * raw magnitude max-rel for reference.

The kernel-vs-chain diff measured in tools/sweep_repr.py (1.3e-4 at
1024, 2.1e-4 at 2048, bipolar) is the SUM of two independent errors;
this probe splits it: whichever path lands closer to f64 is the more
accurate one, and auto may claim the kernel if it is not worse.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/oracle_repr.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import _load_audio

CASES = [(1024, 256), (2048, 512), (4096, 1024)]


def oracle(xb, n_fft, hop, w64):
    half = n_fft // 2
    xp = np.pad(xb.astype(np.float64), [(0, 0), (half, half)], mode="reflect")
    T = 1 + xb.shape[-1] // hop
    frames = np.stack(
        [xp[:, i * hop: i * hop + n_fft] for i in range(T)], axis=1
    )
    spec = np.fft.rfft(frames * w64[None, None, :], axis=-1)
    return spec, T


def circ_w(p, p64, w):
    return float(np.max(w * np.abs(np.exp(1j * p) - np.exp(1j * p64))))


def main():
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu.ops.fft import stft_real, taps_for_window
    from acids_transforms_tpu.ops.pallas.spectral import fused_spectral_repr
    from acids_transforms_tpu.ops.windows import hann_window
    from acids_transforms_tpu.transforms.spectral_repr import IF

    x = _load_audio()
    xb = np.broadcast_to(x, (4, x.shape[-1])).copy().astype(np.float32)
    print(f"device={jax.devices()[0]}", flush=True)

    for n_fft, hop in CASES:
        w = hann_window(n_fft)
        w64 = np.asarray(w, np.float64)
        taps = taps_for_window(w)
        spec64, T = oracle(xb, n_fft, hop, w64)
        mag64 = np.abs(spec64)
        p64 = np.angle(spec64)
        wgt = mag64 / mag64.max()

        # --- kernel: phase + if channels (identity affine, no contrast)
        xj = jnp.asarray(xb)
        x4 = n_fft >= 4096  # what fuse.py dispatches in the 4096 region
        m_k, p_k = fused_spectral_repr(
            xj, n_fft, hop, w, "phase", mel_bank=None,
            aff=(0.0, 1.0, 0.0, 1.0), contrast="none", taps=taps, x4=x4,
        )
        _, if_k = fused_spectral_repr(
            xj, n_fft, hop, w, "if", mel_bank=None,
            aff=(0.0, 1.0, 0.0, 1.0), contrast="none", taps=taps, x4=x4,
        )
        m_k = np.asarray(jax.device_get(m_k))[:, :T]
        p_k = np.asarray(jax.device_get(p_k))[:, :T]
        if_k = np.asarray(jax.device_get(if_k))[:, :T]

        # --- XLA chain: angle over the GEMM-DFT (the chain's own math);
        # fetch re/im separately (complex64 transfer is UNIMPLEMENTED on
        # the tunnel)
        @jax.jit
        def chain_reim(v):
            return stft_real(v, n_fft, hop, w)

        re_c, im_c = chain_reim(xj)
        re_c = np.asarray(jax.device_get(re_c))[:, :T]
        im_c = np.asarray(jax.device_get(im_c))[:, :T]
        p_c = np.arctan2(im_c, re_c)
        m_c = np.hypot(re_c, im_c)
        if_c = np.asarray(IF(sr=44100).get_if_from_phase(jnp.asarray(p_c)))

        rows = {
            "mag_kernel": float(
                np.abs(m_k - mag64).max() / mag64.max()
            ),
            "mag_chain": float(np.abs(m_c - mag64).max() / mag64.max()),
            "phase_kernel": circ_w(p_k, p64, wgt),
            "phase_chain": circ_w(p_c, p64, wgt),
        }
        # IF channels: re-integrate (IF.invert, the transform's own
        # inverse) and compare the phases inversion sees against the f64
        # phases THEMSELVES — integrating the true IF recovers unwrap(p64)
        # whose wrapped value is p64, so no f32 reference pipeline is
        # involved.  (A first version built the reference via the chain's
        # own get_if_from_phase in f32: its unwrap reaches ~1e4 rad where
        # the f32 ulp is ~1e-3, and that error CORRELATES with the chain
        # path under test — it scored the chain 5x better than the kernel
        # purely through shared-pipeline bias.)
        if_t = IF(sr=44100)
        for lbl, v in (("if_kernel", if_k), ("if_chain", if_c)):
            pi_ = np.asarray(if_t.invert(jnp.asarray(v)))
            rows[lbl] = circ_w(pi_, p64, wgt)
        print(
            f"{n_fft}/{hop}: "
            + "  ".join(f"{k}={v:.3e}" for k, v in rows.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
