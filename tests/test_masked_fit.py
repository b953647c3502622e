"""Mask-aware fitting: bucket padding must not skew statistics
(VERDICT r1 item 4; utils/bucketing.frame_mask threaded through fit)."""
import numpy as np
import pytest
import jax.numpy as jnp

from acids_transforms_tpu import transforms as T
from acids_transforms_tpu.utils.bucketing import pad_to_bucket, frame_mask

RNG = np.random.default_rng(17)


@pytest.mark.parametrize("mode", ["unipolar", "bipolar", "gaussian"])
def test_normalize_masked_fit_matches_unpadded(mode):
    x = RNG.standard_normal((3, 1000)).astype(np.float32) * 3.0 + 1.0
    xp, mask, _ = pad_to_bucket(x, buckets=(2048,))
    ref = T.Normalize(mode=mode).fit(jnp.asarray(x))
    fit = T.Normalize(mode=mode).fit(xp, mask=mask)
    np.testing.assert_allclose(float(fit.offset), float(ref.offset), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(fit.scale), float(ref.scale), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["unipolar", "gaussian"])
def test_chain_masked_fit_matches_unpadded(mode):
    """fit(padded, mask) == fit(unpadded) through a full STFT+Magnitude chain.

    The unpadded frame grid must be a sub-grid of the padded one, so the true
    length is hop-aligned; the mask excludes every frame whose hop-start falls
    in the padding."""
    hop, n_fft = 128, 512
    L = 64 * hop
    x = RNG.standard_normal((2, L)).astype(np.float32)
    xp, mask, _ = pad_to_bucket(x, buckets=(2 * L,))

    chain = lambda: T.STFT(n_fft=n_fft, hop_length=hop) + T.Magnitude(
        mode=mode, mel=True, n_fft=n_fft
    )
    ref = chain().fit(jnp.asarray(x))
    fit = chain().fit(xp, mask=mask)
    raw = chain().fit(xp)  # unmasked fit on the padded batch: skewed
    norm_ref, norm_fit, norm_raw = ref[1].norm, fit[1].norm, raw[1].norm
    # masked stats match the unpadded fit up to the frames that straddle the
    # pad boundary (their *values* differ: reflect- vs zero-padding); the
    # unmasked fit on the same padded batch is skewed by orders more.
    for attr in ("offset", "scale"):
        m = float(getattr(norm_fit, attr))
        r = float(getattr(norm_ref, attr))
        u = float(getattr(norm_raw, attr))
        assert abs(m - r) <= 1.5e-2 * max(abs(r), 1e-3), (attr, m, r)
        if abs(u - r) > 1e-6:  # unipolar min over >=0 data can coincide
            assert abs(u - r) > 5 * abs(m - r) or abs(m - r) < 1e-7


def test_mono_chain_mask_propagation():
    hop, n_fft = 128, 512
    L = 256 * hop
    x = RNG.standard_normal((2, 2, L)).astype(np.float32)
    xp, mask, _ = pad_to_bucket(x, buckets=(2 * L,))
    mask = mask[:, 0]  # channel-free sample mask (B, L)
    chain = T.Mono() + T.STFT(n_fft=n_fft, hop_length=hop) + T.Magnitude(
        mode="gaussian", mel=False, n_fft=n_fft
    )
    ref = chain.fit(jnp.asarray(x))
    fit = chain.fit(xp, mask=mask)
    # boundary frames straddle the pad (reflect- vs zero-padded values)
    np.testing.assert_allclose(
        float(fit[2].norm.offset), float(ref[2].norm.offset), rtol=1e-2, atol=1e-3
    )
    np.testing.assert_allclose(
        float(fit[2].norm.scale), float(ref[2].norm.scale), rtol=1e-2, atol=1e-3
    )


def test_mfcc_masked_fit():
    L = 4096
    x = RNG.standard_normal((2, L)).astype(np.float32)
    xp, mask, _ = pad_to_bucket(x, buckets=(8192,))
    ref = T.MFCC(norm_mode="gaussian").fit(jnp.asarray(x))
    fit = T.MFCC(norm_mode="gaussian").fit(xp, mask=mask)
    np.testing.assert_allclose(float(fit.norm.offset), float(ref.norm.offset), rtol=1e-5)
    np.testing.assert_allclose(float(fit.norm.scale), float(ref.norm.scale), rtol=1e-5)


def test_masked_fit_under_jit():
    x = RNG.standard_normal((2, 4096)).astype(np.float32)
    xp, mask, _ = pad_to_bucket(x, buckets=(8192,))
    t = T.Normalize(mode="gaussian")
    fitted = t.jfit(xp, mask=mask)
    ref = t.fit(jnp.asarray(x))
    np.testing.assert_allclose(float(fitted.offset), float(ref.offset), rtol=1e-5)
    np.testing.assert_allclose(float(fitted.scale), float(ref.scale), rtol=1e-5)


def test_frame_mask_helper_consumed():
    """frame_mask agrees with the STFT propagate convention on aligned grids."""
    sample_mask = jnp.zeros((2, 1024)).at[..., :512].set(1.0)
    fm = frame_mask(sample_mask, 256, 128)
    assert fm.shape[-1] == (1024 - 256) // 128 + 1
    np.testing.assert_array_equal(np.asarray(fm[0]), [1, 1, 1, 1, 0, 0, 0])


def test_import_data_return_mask(tmp_path):
    """Directory import_data(return_mask=True): the pad mask reaches the
    pure fit API so ragged corpora fit identically to their unpadded
    originals (the loader pads to the longest file)."""
    from acids_transforms_tpu.utils.misc import import_data, save_wav

    n1, n2 = 3000, 5000
    a = (0.3 * np.sin(2 * np.pi * 440 * np.arange(n1) / 44100)).astype(np.float32)
    b = RNG.standard_normal(n2).astype(np.float32) * 0.1 + 0.5
    save_wav(str(tmp_path / "a.wav"), a, 44100)
    save_wav(str(tmp_path / "b.wav"), b, 44100)

    x, names, mask = import_data(str(tmp_path), sr=44100, return_mask=True)
    assert x.shape == (2, 1, n2) and mask.shape == (2, 1, n2)
    assert mask.sum(axis=-1).ravel().tolist() == [n1, n2]
    # padding region is exactly the zeroed samples
    np.testing.assert_array_equal(x[0, :, n1:], 0.0)

    fitted = T.Normalize(mode="gaussian").fit(jnp.asarray(x), mask=jnp.asarray(mask))
    real = np.concatenate([np.asarray(x)[0, 0, :n1], np.asarray(x)[1, 0, :n2]])
    np.testing.assert_allclose(float(fitted.offset), real.mean(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        float(fitted.scale), real.std(ddof=1), rtol=1e-3, atol=1e-5
    )

    # single-file arity: all-ones mask, broadcastable to the array
    xa, _, ma = import_data(str(tmp_path / "a.wav"), sr=44100, return_mask=True)
    assert ma.shape == (1, xa.shape[1]) and float(ma.min()) == 1.0
