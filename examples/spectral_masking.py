"""Spectral processing loop: analysis -> model -> phaseless resynthesis.

The intended production pattern: a (neural) model edits normalized mel/log
magnitudes; the chain's inversion turns them back into audio with PGHI-seeded
Griffin-Lim.  Here the "model" is a toy soft denoising mask.
"""
import numpy as np
import jax.numpy as jnp

import acids_transforms_tpu as att
from acids_transforms_tpu import transforms as T


def main():
    sr = 44100
    t = np.arange(2 * sr) / sr
    clean = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate([220, 440, 880]))
    noisy = (0.5 * clean / np.abs(clean).max()).astype(np.float32)
    noisy = noisy + 0.05 * np.random.default_rng(0).standard_normal(noisy.shape).astype(np.float32)

    # analysis chain: DGT magnitudes, log-compressed, unit-normalized
    chain = T.DGT(n_fft=1024, hop_length=256) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=False, n_fft=1024
    )
    chain.scale_data(jnp.asarray(noisy))
    feats = chain.jforward(jnp.asarray(noisy))            # (T, F) in [0, 1]

    # "model": soft-threshold mask in the normalized feature space
    mask = jnp.clip((feats - 0.25) * 8.0, 0.0, 1.0)
    feats_denoised = feats * mask

    # resynthesis: denorm + expm1 back to magnitudes, PGHI+GL phase
    audio = chain.jinvert(feats_denoised, inversion_mode="pghi_gl")
    att.utils.save_wav("denoised.wav", np.clip(np.asarray(audio), -1, 1), sr)
    print("wrote denoised.wav", np.asarray(audio).shape)


if __name__ == "__main__":
    main()
