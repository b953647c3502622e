"""Utility-layer tests: WAV IO (numpy + native parity), resampling quality,
numerical guards, list helpers."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from acids_transforms_tpu import transforms as T
from acids_transforms_tpu.transforms.base import (
    apply_invert_transform_to_list,
    apply_transform_to_list,
)
from acids_transforms_tpu.utils.debug import checked
from acids_transforms_tpu.utils.misc import import_data, load_wav, resample, save_wav

RNG = np.random.default_rng(11)
REF_WAVS = "/root/reference/test/source_files"


def test_wav_roundtrip_float32(tmp_path):
    x = RNG.standard_normal((2, 10000)).astype(np.float32) * 0.5
    p = str(tmp_path / "a.wav")
    save_wav(p, x, 22050)
    y, sr = load_wav(p)
    assert sr == 22050
    np.testing.assert_allclose(y, x, atol=0)


def test_wav_roundtrip_pcm16(tmp_path):
    x = np.clip(RNG.standard_normal(5000).astype(np.float32) * 0.3, -0.99, 0.99)
    p = str(tmp_path / "b.wav")
    save_wav(p, x, 44100, pcm16=True)
    y, sr = load_wav(p)
    assert np.abs(y[0] - x).max() < 1e-3  # 16-bit quantization


def test_load_wav_pcm_raw_ingest(tmp_path):
    """load_wav_pcm keeps 16-bit files wire-format int16 (converting /32768
    reproduces load_wav exactly); non-PCM files and resample requests raise
    loudly; directory pcm batches stay int16 with exact zero padding."""
    from acids_transforms_tpu.utils.misc import load_wav_pcm

    x = (RNG.standard_normal((2, 5000)) * 0.4).astype(np.float32)
    p = str(tmp_path / "a.wav")
    save_wav(p, x, 44100, pcm16=True)
    xi, sr = load_wav_pcm(p)
    assert xi.dtype == np.int16 and sr == 44100 and xi.shape == (2, 5000)
    xf, _ = load_wav(p)
    assert np.array_equal(xi.astype(np.float32) / 32768.0, xf)
    # float-format file refuses (no silent float fallback)
    pf = str(tmp_path / "f.wav")
    save_wav(pf, x, 44100)
    with pytest.raises(ValueError, match="16-bit PCM"):
        load_wav_pcm(pf)
    # import_data pcm=True: resample request raises; matching sr stays int16
    with pytest.raises(ValueError, match="resampling"):
        import_data(p, sr=22050, pcm=True)
    b, _ = import_data(p, sr=44100, pcm=True)
    assert b.dtype == np.int16
    # directory: shorter mono file is stereo-promoted + zero-padded, all
    # int16; the float f.wav falls under skip-unreadable semantics
    p2 = str(tmp_path / "b.wav")
    save_wav(p2, x[0, :3000], 44100, pcm16=True)
    batch, names = import_data(str(tmp_path), sr=44100, pcm=True)
    assert batch.dtype == np.int16
    assert batch.shape == (2, 2, 5000) and names == ["a", "b"]
    assert np.all(batch[1, :, 3000:] == 0)


def test_load_reference_corpus():
    """The reference WAVs (incl. the BWF kick.wav with a bext chunk and the
    22.05k additive.wav) load and resample correctly."""
    if not os.path.isdir(REF_WAVS):
        pytest.skip("reference corpus not mounted")
    batch, names = import_data(REF_WAVS, sr=44100)
    assert batch.ndim == 3 and batch.shape[0] == len(names)
    assert np.isfinite(batch).all()


def test_resample_preserves_sine():
    sr_in, sr_out, f0 = 22050, 44100, 440.0
    t = np.arange(22050) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert abs(y.shape[-1] - 44100) <= 1
    t2 = np.arange(y.shape[-1]) / sr_out
    ref = np.sin(2 * np.pi * f0 * t2)
    inner = slice(1000, -1000)
    err = np.abs(y[inner] - ref[inner]).max()
    assert err < 1e-3, err


def test_resample_rejects_aliases():
    """Downsampling must lowpass: a tone above the target nyquist vanishes."""
    sr_in, sr_out = 44100, 22050
    t = np.arange(44100) / sr_in
    x = np.sin(2 * np.pi * 15000.0 * t).astype(np.float32)  # > 11.025 kHz
    y = resample(x, sr_in, sr_out)
    assert np.abs(y[1000:-1000]).max() < 1e-2


def test_native_wavio_matches_numpy(tmp_path):
    from acids_transforms_tpu.native import wavio_native

    if not wavio_native.available():
        pytest.skip("native library not built")
    x = RNG.standard_normal((2, 30000)).astype(np.float32) * 0.5
    p = str(tmp_path / "n.wav")
    save_wav(p, x, 44100)
    a, sr_a = load_wav(p)
    b, sr_b = wavio_native.load_wav(p)
    assert sr_a == sr_b
    np.testing.assert_allclose(a, b, atol=0)
    ra = resample(x, 44100, 22050)
    rb = wavio_native.resample(x, 44100, 22050)
    assert ra.shape == rb.shape
    assert np.abs(ra - rb).max() < 1e-4


def test_checked_catches_nan():
    fn = checked(lambda x: jnp.log(x))
    fn(jnp.asarray([1.0, 2.0]))  # fine
    with pytest.raises(Exception):
        fn(jnp.asarray([-1.0]))  # log of negative -> nan -> raises


def test_apply_transform_to_list():
    t = T.Stereo()
    data = [jnp.zeros(100), jnp.zeros(200)]
    outs = apply_transform_to_list(t, data)
    assert outs[0].shape == (2, 100) and outs[1].shape == (2, 200)
    invs = apply_invert_transform_to_list(t, outs)
    assert invs[0].shape == (2, 100)


def test_bucketing_policy():
    from acids_transforms_tpu.utils.bucketing import default_buckets, frame_mask, pad_to_bucket

    buckets = default_buckets(0.25, 10.0)
    assert all(b2 > b1 for b1, b2 in zip(buckets, buckets[1:]))
    x = RNG.standard_normal((3, 20000)).astype(np.float32)
    padded, mask, bucket = pad_to_bucket(x, buckets)
    assert padded.shape[-1] == bucket >= 20000
    assert float(mask[..., :20000].min()) == 1.0
    assert float(mask[..., 20000:].max() if bucket > 20000 else 0.0) == 0.0
    fm = frame_mask(mask, 1024, 256)
    assert fm.shape[-1] == (bucket - 1024) // 256 + 1
    # same bucket for nearby lengths -> no recompiles
    p2, _, b2 = pad_to_bucket(x[..., :19000], buckets)
    assert b2 == bucket
