"""Export a fitted mel-spectrogram chain for the standalone C++ PJRT host.

Produces, in the target directory:

* ``melspec.stablehlo.mlir`` — the jitted fused forward as a StableHLO
  module (chain parameters frozen as constants, exactly like TorchScript
  freezing);
* ``input.bin`` / ``input_shape.txt`` — float32 test input;
* ``expected.bin`` — the Python-side output the host must reproduce.

Usage: python export_artifact.py <out_dir>
"""
import os
import sys

import numpy as np

# runnable from any cwd: the package lives two levels up
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main(out_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.fuse import fuse_forward

    os.makedirs(out_dir, exist_ok=True)
    sr, n_fft, hop = 44100, 1024, 256
    t = np.arange(sr) / sr
    x = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate([220, 440, 660]))
    x = np.stack([x, 0.5 * x]).astype(np.float32)  # (2, sr)
    xj = jnp.asarray(x)

    chain = (
        T.STFT(n_fft=n_fft, hop_length=hop)
        + T.Magnitude(mode="unipolar", contrast="log1p", mel=True, n_fft=n_fft)
    ).fit(xj)
    # pin the XLA formulation: backend="auto" would bake the TPU Pallas
    # kernel (a tpu_custom_call) into the artifact, which a CPU host
    # cannot execute — exported modules must be portable StableHLO
    fused = fuse_forward(chain, backend="xla")

    lowered = jax.jit(fused).lower(xj)
    mlir_text = lowered.as_text()  # StableHLO module, parameters inlined
    with open(os.path.join(out_dir, "melspec.stablehlo.mlir"), "w") as f:
        f.write(mlir_text)

    y = np.asarray(fused(xj)).astype(np.float32)
    x.tofile(os.path.join(out_dir, "input.bin"))
    with open(os.path.join(out_dir, "input_shape.txt"), "w") as f:
        f.write(" ".join(str(d) for d in x.shape))
    y.tofile(os.path.join(out_dir, "expected.bin"))
    print("exported:", out_dir, "input", x.shape, "->", y.shape)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "./artifact")
