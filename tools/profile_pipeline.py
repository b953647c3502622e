"""Capture an XProf/Perfetto trace of the headline pipeline.

Usage: ``python tools/profile_pipeline.py [logdir]`` (defaults to
``/tmp/att_trace``).  Open the result with XProf/TensorBoard or
ui.perfetto.dev.  Stages are named with ``utils.annotate`` so the timeline
reads as framing/DFT/mel rather than anonymous fusions.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/att_trace"

    import jax
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.utils import annotate, trace

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 4 * 44100)).astype(np.float32))
    chain = (
        T.Mono()
        + T.STFT(n_fft=1024, hop_length=256)
        + T.Magnitude(mode="unipolar", contrast="log1p", mel=True, n_fft=1024)
    ).fit(x)

    @jax.jit
    def step(v):
        with annotate("melspec_forward"):
            y = chain.forward(v)
        with annotate("istft_roundtrip"):
            spec = chain[1].forward(chain[0].forward(v))
            rec = chain[1].invert(spec)
        return y, rec

    float(jnp.mean(step(x)[0]))  # compile outside the trace
    with trace(logdir):
        for _ in range(5):
            y, rec = step(x)
        float(jnp.mean(y))  # force completion inside the trace window
    print("trace written to", logdir)


if __name__ == "__main__":
    main()
