"""One-shot TPU check: gradient through the fused Pallas forward.

The fused forward's AD rule (fuse.py custom_vjp) pairs the kernel primal
with the XLA formulation's VJP; the suite exercises it only in CPU
interpret mode.  This script runs the same check on the real chip and
prints real-valued scalars only (complex device->host is UNIMPLEMENTED
on the tunnel).

Run:  PYTHONPATH=/root/repo:/root/.axon_site \
      JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
      timeout 600 python tools/verify_grad_tpu.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from acids_transforms_tpu import transforms as T
from acids_transforms_tpu import fuse


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 44100)).astype(np.float32) * 0.3)

    chain = T.Mono() + T.STFT(n_fft=1024, hop_length=256) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=1024
    )
    chain = chain.fit(x)

    fused = fuse.fuse_forward(chain, backend="pallas")
    target = jax.jit(chain.jforward)(x)

    def loss_fused(z):
        return jnp.mean((fused(z) - target) ** 2)

    def loss_xla(z):
        return jnp.mean((chain.jforward(z) - target) ** 2)

    z = x + 0.01
    g_fused = jax.jit(jax.grad(loss_fused))(z)
    g_xla = jax.jit(jax.grad(loss_xla))(z)

    finite = float(jnp.isfinite(g_fused).all().astype(jnp.float32))
    gnorm = float(jnp.linalg.norm(g_fused))
    rel = float(jnp.linalg.norm(g_fused - g_xla) / (jnp.linalg.norm(g_xla) + 1e-30))
    print(f"finite={finite} |g|={gnorm:.6e} rel_vs_xla={rel:.3e}", flush=True)
    assert finite == 1.0, "non-finite gradient on TPU"
    assert gnorm > 0, "zero gradient"
    # the bwd IS the XLA vjp; difference comes only from the primal residual
    # feeding the loss' upstream cotangent (kernel vs chain ~6.5e-5)
    assert rel < 5e-3, f"fused grad diverges from XLA grad: {rel}"
    print("OK: fused-forward gradient verified on TPU", flush=True)


if __name__ == "__main__":
    main()
