"""Differentiability: transform chains are pure pytree functions, so
``jax.grad`` flows through them — spectral losses for neural-audio training
come for free (impossible in the reference's mutating-buffer design)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acids_transforms_tpu import transforms as T


@pytest.fixture(scope="module")
def sig():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32) * 0.3)


def test_grad_through_melspec_chain(sig):
    chain = T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=512
    )
    chain = chain.fit(sig)
    target = chain.forward(sig)

    def loss(x):
        return jnp.mean((chain.forward(x) - target) ** 2)

    g = jax.grad(loss)(sig + 0.01)
    assert g.shape == sig.shape
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_grad_through_istft(sig):
    """Gradient flows through the full analysis-synthesis round trip."""
    stft_t = T.STFT(n_fft=512, hop_length=128)

    def loss(x):
        rec = stft_t.invert(stft_t.forward(x))
        return jnp.mean(rec ** 2)

    g = jax.grad(loss)(sig)
    assert bool(jnp.isfinite(g).all())


def test_grad_wrt_transform_params(sig):
    """Transforms are pytrees: differentiate w.r.t. their parameters (e.g.
    learn the normalizer) — the 'transforms inside a model' use case."""
    chain = (T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=False, n_fft=512
    )).fit(sig)

    def loss(c, x):
        return jnp.mean(c.forward(x) ** 2)

    # allow_int: the transform pytree carries uint32 PRNG-key leaves, which
    # get float0 cotangents
    grads = jax.grad(loss, allow_int=True)(chain, sig)
    norm_grad = grads[1].norm
    assert bool(jnp.isfinite(norm_grad.offset).all())
    assert bool(jnp.isfinite(norm_grad.scale).all())


def test_vmap_over_transform_batch(sig):
    """vmap over a *batch of transforms* (different fitted stats per item)."""
    norms = jax.vmap(lambda s: T.Normalize(mode="gaussian").fit(s))(sig)
    ys = jax.vmap(lambda n, s: n.forward(s))(norms, sig)
    assert ys.shape == sig.shape
    m = np.asarray(ys).mean(axis=-1)
    np.testing.assert_allclose(m, 0.0, atol=1e-5)
