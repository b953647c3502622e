"""CompiledTransform serving wrapper: bucket dispatch, trim correctness,
warmup compilation count."""
import numpy as np
import pytest
import jax.numpy as jnp

from acids_transforms_tpu import transforms as T
from acids_transforms_tpu.serving import CompiledTransform

RNG = np.random.default_rng(9)


@pytest.fixture(scope="module")
def server():
    chain = T.STFT(n_fft=512, hop_length=128) + T.Magnitude(
        mode="unipolar", mel=False, n_fft=512
    )
    fit_x = jnp.asarray(RNG.standard_normal((2, 8192)).astype(np.float32))
    chain = chain.fit(fit_x)
    return CompiledTransform(chain, buckets=(8192, 16384), batch_sizes=(2, 4))


def test_forward_matches_unpadded(server):
    x = RNG.standard_normal((2, 7000)).astype(np.float32)
    y = server.forward(jnp.asarray(x))
    ref = server.transform.forward(jnp.asarray(x))
    assert y.shape == ref.shape
    # interior frames are bit-identical; the last window of frames sees the
    # bucket zero-padding instead of reflect padding (documented)
    t_interior = (7000 - 512 // 2) // 128
    np.testing.assert_allclose(
        np.asarray(y)[..., :t_interior, :], np.asarray(ref)[..., :t_interior, :], atol=1e-5
    )


def test_batch_and_length_padding(server):
    x = RNG.standard_normal((3, 10000)).astype(np.float32)  # batch 3 -> 4, len -> 16384
    y = server.forward(jnp.asarray(x))
    assert y.shape[0] == 3
    assert y.shape[-2] == 10000 // 128 + 1


def test_out_of_range_raises(server):
    with pytest.raises(ValueError):
        server.forward(jnp.zeros((2, 100000)))
    with pytest.raises(ValueError):
        server.forward(jnp.zeros((5, 1000)))


def test_warmup_counts(server):
    assert server.warmup() == 4  # 2 buckets x 2 batch sizes


def test_invert_path(server):
    x = RNG.standard_normal((2, 8192)).astype(np.float32)
    y = server.forward(jnp.asarray(x))
    m = server.invert(y)
    assert np.isfinite(np.asarray(m)).all()
