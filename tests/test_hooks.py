"""Discovery-driven hook suite: every exported transform is exercised through
its own ``test_forward`` / ``test_inversion`` / ``test_jit_transform`` hooks —
the reference's test architecture (reference test/test_transforms.py:8-68)
with finite-output assertions and reconstruction WAV dumps."""
import inspect
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acids_transforms_tpu import transforms as T
from acids_transforms_tpu.utils.misc import save_wav

RECON_DIR = os.path.join(os.path.dirname(__file__), "reconstructions")


def get_audio_transforms():
    out = []
    for name in T.__all__:
        obj = getattr(T, name)
        if (
            inspect.isclass(obj)
            and issubclass(obj, T.AudioTransform)
            and obj
            not in (T.AudioTransform, T.ComposeAudioTransform, T.SpectralRepresentation)
        ):
            out.append(obj)
    return out


def get_invertible():
    return [c for c in get_audio_transforms() if c().invertible]


def get_jittable():
    return [c for c in get_audio_transforms() if c().scriptable]


def _leaves_finite(tree) -> bool:
    return all(
        bool(jnp.isfinite(leaf).all())
        for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
    )


@pytest.mark.parametrize("cls", get_audio_transforms())
def test_forward_hook(test_files, cls):
    sig, _ = test_files
    t = cls()
    y = t.test_forward(jnp.asarray(sig))
    assert _leaves_finite(y)
    t2 = cls()
    time = jnp.zeros(sig.shape[:-1])
    out = t2.test_forward(jnp.asarray(sig), time)
    assert _leaves_finite(out)


@pytest.mark.parametrize("cls", get_audio_transforms())
def test_realtime_hook(test_files, cls):
    sig, _ = test_files
    rt = cls().realtime()
    y = rt.test_forward(jnp.asarray(sig))
    assert _leaves_finite(y)


@pytest.mark.parametrize("cls", get_invertible())
def test_inversion_hook(test_files, cls):
    sig, names = test_files
    t = cls()
    # a short single-item slice exercises every inversion mode at a fraction
    # of the cost (the spectral hooks run all 6-7 modes incl. the host heap)
    sig = sig[:1, :, : sig.shape[-1] // 2]
    outs = t.test_inversion(jnp.asarray(sig))
    assert isinstance(outs, dict) and outs
    os.makedirs(RECON_DIR, exist_ok=True)
    for mode, rec in outs.items():
        rec = np.asarray(rec)
        assert np.isfinite(rec).all(), (cls.__name__, mode)
        # dump audio-shaped reconstructions for aural inspection
        if rec.ndim >= 1 and rec.shape[-1] > 1000 and np.isrealobj(rec):
            flat = rec.reshape(-1, rec.shape[-1])[0]
            save_wav(
                os.path.join(RECON_DIR, f"{names[0]}_{cls.__name__}_{mode}.wav"),
                np.clip(flat, -1, 1),
                44100,
            )


@pytest.mark.parametrize("cls", get_jittable())
def test_jit_hook(test_files, cls):
    sig, _ = test_files
    t = cls()
    if isinstance(t, (T.RealtimeSTFT, T.RealtimeDGT)):
        x = jnp.asarray(sig[..., : t.n_fft])
    elif isinstance(t, (T.Real, T.Imaginary, T.Magnitude, T.Phase, T.IF,
                        T.Cartesian, T.Polar, T.PolarIF)):
        x = T.STFT().forward(jnp.asarray(sig))
    elif isinstance(t, T.OneHot):
        x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 500)))
        t.scale_data(x)
    else:
        x = jnp.asarray(sig)
    t.test_jit_transform(x, invert=not isinstance(t, T.Squeeze))
