"""Basic usage: the reference README flow, TPU-native.

Builds a Mono + DGT + Magnitude chain, fits normalizer statistics, runs the
jitted forward, reconstructs audio with PGHI, and writes the result.
"""
import numpy as np
import jax.numpy as jnp

import acids_transforms_tpu as att
from acids_transforms_tpu import transforms as T


def main():
    # load a file or directory (WAV, any common bit depth; auto-resampled)
    x, name = att.utils.import_data(
        "/root/reference/test/source_files/additive.wav", sr=44100
    )
    print("loaded", name, x.shape)

    transform = T.Mono() + T.DGT(n_fft=1024, hop_length=256) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True
    )

    transform.scale_data(jnp.asarray(x))          # fit normalizer stats
    y = transform.jforward(jnp.asarray(x))        # jit-compiled forward
    print("mel-spectrogram:", y.shape)

    x_rec = transform.jinvert(y, inversion_mode="pghi")   # phaseless inversion
    att.utils.save_wav("reconstruction.wav", np.asarray(x_rec), 44100)
    print("wrote reconstruction.wav", x_rec.shape)

    # checkpoint the fitted chain; reload elsewhere
    att.export.save_transform(transform, "chain.npz")
    restored = att.export.load_transform("chain.npz")
    assert jnp.allclose(restored.jforward(jnp.asarray(x)), y, atol=1e-6)


if __name__ == "__main__":
    main()
